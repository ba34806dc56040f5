"""Codec auto-selection: sampled per-column stats + a size cost model.

The direct generalization of d6tstack's two-phase sniffing (SURVEY.md §3.3):
the reference samples ``nrows_preview`` rows per file to decide schema
(combine_csv.py:108-179) and majority-votes a CSV dialect per file
(sniffer.py:58-98); this module samples a column slice to decide the codec
that minimizes estimated encoded size. Deterministic: stats come from a
fixed-stride sample, ties break on a fixed decode-cheapness order.
"""

from __future__ import annotations

import numpy as np

from d6tstack_spark.codecs import kernels

_SAMPLE_CAP = 4096  # values sampled for stats (fixed stride → deterministic)
_FSST_TRIAL_CAP = 512  # strings trial-encoded to estimate the fsst ratio

# ties → cheapest decode wins (plain is a memcpy; fsst needs a token scan)
_DECODE_COST_ORDER = ["plain", "for", "bitpack", "delta", "dict", "rle",
                      "fpsplit", "fsst"]
_RANK = {c: i for i, c in enumerate(_DECODE_COST_ORDER)}


def _sample(values: np.ndarray) -> np.ndarray:
    """Strided sample — representative of global value distribution."""
    n = len(values)
    if n <= _SAMPLE_CAP:
        return values
    stride = n // _SAMPLE_CAP
    return values[::stride][:_SAMPLE_CAP]


def _contig_sample(values: np.ndarray) -> np.ndarray:
    """Contiguous sample — preserves run structure and adjacent deltas, which
    a strided sample would destroy (inflating deltas, splitting runs)."""
    return values[:_SAMPLE_CAP]


def sniff_stats(
    values: np.ndarray, ptype: str, sample_lens: np.ndarray | None = None
) -> dict:
    """Per-column stats on a sample: cardinality, avg run length, symbol
    entropy (strings), value range (ints), avg item bytes (strings).
    ``sample_lens``: precomputed byte lengths ALIGNED WITH ``values`` (the
    Arrow hot path already has them from pc.binary_length — skips a python
    loop); strided exactly like the value sample so avg_len/sum_len
    describe the same rows the other stats do, not the column head."""
    s = _sample(values)
    c = _contig_sample(values)
    n = len(s)
    stats: dict = {"n_sampled": n, "n_total": len(values)}
    if sample_lens is not None:
        sl = np.asarray(sample_lens)
        if len(values) > _SAMPLE_CAP:  # mirror _sample's stride
            sl = sl[:: len(values) // _SAMPLE_CAP][:_SAMPLE_CAP]
        stats["_lens"] = sl[:n]
    if n == 0:
        stats.update(card=0, avg_run=1.0, ent=0.0)
        return stats
    sv = kernels._sortable_view(s, ptype)
    # hash-based uniquing: np.unique SORTS (object-string sorts measured 4x
    # the count cost on the sniff sample); only the cardinality is needed
    import pandas as _pd

    stats["card"] = int(len(_pd.unique(sv)))
    runs = len(kernels.run_boundaries(c, ptype))
    stats["avg_run"] = float(len(c) / max(runs, 1))
    if kernels.is_string_ptype(ptype):
        lens = stats.pop("_lens", None)
        if lens is None:
            lens = np.fromiter((len(x) for x in s), dtype=np.int64, count=n)
        stats["avg_len"] = float(lens.mean())
        stats["sum_len_sampled"] = int(lens.sum())
        # byte-level symbol entropy over a bounded concat sample
        concat = b"".join(s[:256].tolist())[:65536]
        if concat:
            freq = np.bincount(np.frombuffer(concat, dtype=np.uint8), minlength=256)
            p = freq[freq > 0] / len(concat)
            stats["ent"] = float(-(p * np.log2(p)).sum())
        else:
            stats["ent"] = 0.0
    elif kernels.is_int_ptype(ptype):
        lo, hi = int(sv.min()), int(sv.max())
        stats["min"] = lo
        stats["max"] = hi
        stats["for_width"] = int(hi - lo).bit_length()
        if len(c) > 1:
            d = np.diff(c.astype(np.int64))
            zz = kernels.zigzag(d)
            stats["delta_width"] = int(int(zz.max()).bit_length())
        else:
            stats["delta_width"] = 0
    elif ptype in ("f32", "f64"):
        stats["exp_ent"] = kernels.float_exponent_entropy(s, ptype)
    return stats


def _estimate_sizes(values: np.ndarray, ptype: str, stats: dict) -> dict[str, float]:
    """Estimated encoded bytes per candidate codec, scaled to the full column."""
    n = stats["n_total"]
    ns = max(stats["n_sampled"], 1)
    scale = n / ns
    card = max(stats["card"], 1)
    # sampled cardinality saturates at the sample size for high-cardinality
    # columns; extrapolate linearly so dict isn't chosen on a mirage
    if n > ns and card > 0.5 * ns:
        card = min(int(card * scale), n)
    runs = max(int(round(ns / stats["avg_run"])), 1)
    est: dict[str, float] = {}
    if kernels.is_string_ptype(ptype):
        sum_len = stats.get("sum_len_sampled")
        if sum_len is None:
            sum_len = sum(len(x) for x in _sample(values))
        data_bytes = float(sum_len) * scale
        avg_len = stats.get("avg_len", 8.0)
        est["plain"] = data_bytes + n * 1.2  # + packed lengths
        # dict stores each unique once; sampled card is a lower bound on the
        # true card, so this under-estimates for high-cardinality columns —
        # acceptable: those columns lose to fsst/plain on the code-width term
        code_w = max((card - 1).bit_length(), 1)
        est["dict"] = min(card * (avg_len + 1.2), n * avg_len) + n * code_w / 8
        est["rle"] = runs * scale * (avg_len + 1.2) + runs * scale * 2
        # fsst trial-encoding costs ~5-10ms per call; only worth it for
        # text-like columns (long values) — short/categorical strings are
        # always won by dict/rle/plain anyway
        if avg_len >= 12:
            est["fsst"] = _fsst_trial_ratio(values) * data_bytes + n * 1.2
    else:
        item = kernels.dtype_of(ptype).itemsize
        est["plain"] = float(n * item)
        code_w = max((card - 1).bit_length(), 1)
        est["dict"] = card * item + n * code_w / 8
        est["rle"] = runs * scale * (item + 2)
        if kernels.is_int_ptype(ptype):
            # note: no "bitpack" estimate — FOR strictly dominates it
            # (bitpack ≡ FOR with ref pinned to 0) and never fails on
            # negatives the sample missed; bitpack stays available for
            # explicit codec= requests
            est["for"] = n * stats.get("for_width", item * 8) / 8 + 16
            est["delta"] = n * stats.get("delta_width", item * 8) / 8 + 16
        elif ptype in ("f32", "f64"):
            # sign (1 bit) + mantissa (full width) + exponent near its
            # sampled entropy (zstd on the exponent stream gets close)
            mant_bits = 23 if ptype == "f32" else 52
            exp_ent = stats.get("exp_ent", 8.0)
            est["fpsplit"] = (
                n * (1 + mant_bits) / 8 + n * exp_ent / 8 * 1.1 + 64
            )
    return est


def _fsst_trial_ratio(values: np.ndarray) -> float:
    """Compression ratio estimate from trial-encoding a bounded sample."""
    s = values[:_FSST_TRIAL_CAP]
    if len(s) == 0:
        return 1.0
    raw = sum(len(x) for x in s) + len(s)
    if raw == 0:
        return 1.0
    payload, _ = kernels.encode_values(np.asarray(s, dtype=object), "str", "fsst")
    return min(len(payload) / raw, 1.0)


def choose_codec(values: np.ndarray, ptype: str, stats: dict | None = None) -> str:
    """Pick the codec with minimum estimated size; ties → cheapest decode."""
    if len(values) == 0:
        return "plain"
    if stats is None:
        stats = sniff_stats(values, ptype)
    est = _estimate_sizes(values, ptype, stats)
    allowed = set(kernels.valid_codecs(ptype))
    ranked = sorted(
        ((sz, _RANK[c], c) for c, sz in est.items() if c in allowed),
        key=lambda t: (t[0], t[1]),
    )
    return ranked[0][2]
