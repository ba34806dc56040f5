"""Manifests, lineage/metrics, checkpoint/resume."""
