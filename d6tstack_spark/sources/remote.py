"""FTP / S3 legs of the diff-sync (SURVEY.md §2.1 S13) — the reference's
``FTPSync`` (sync.py:8-164) re-expressed Spark-first with pure-stdlib
clients:

- listings (FTP recursive MLSD walk, S3 ``ListObjectsV2`` with
  continuation-token pagination) are small metadata sets, fetched
  driver-side — exactly like the reference's ``get_all_files`` /
  ``get_s3_files`` (sync.py:61-108) — and turned into DataFrames;
- the sync set is a ``left_anti`` join on relative path, optionally
  widened by size drift (the reference's ``set().difference``,
  sync.py:139);
- the transfer is DISTRIBUTED: each executor task opens its own FTP
  control connection and copies its slice of the missing list, optionally
  forwarding to S3 (the reference downloads serially on the driver,
  sync.py:155-164 — a non-starter at 100 TB; per-task connections shard
  the bandwidth across the cluster).

Clients are stdlib (:mod:`ftplib`, :mod:`urllib`): no boto3/ftputil in
the image. The S3 client speaks the unauthenticated REST dialect served
by S3-compatible dev endpoints (and :class:`~d6tstack_spark.testing.
StubS3Server`); real AWS would additionally need SigV4 signing, which is
out of scope in a sandbox with no network.
"""

from __future__ import annotations

import os
import posixpath
from ftplib import FTP
from typing import Iterator
from urllib.parse import quote
from urllib.request import Request, urlopen
from xml.etree import ElementTree

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sync import list_files


# --------------------------------------------------------------------------
# FTP client (stdlib ftplib)
# --------------------------------------------------------------------------

def _ftp_connect(host: str, port: int, user: str | None,
                 password: str | None) -> FTP:
    ftp = FTP()
    ftp.connect(host, port, timeout=30)
    ftp.login(user or "anonymous", password or "")
    return ftp


def ftp_list_files(host: str, port: int = 21, user: str | None = None,
                   password: str | None = None, root: str = "/",
                   recursive: bool = True) -> list[dict]:
    """Recursive remote manifest [(relpath, length)] via MLSD — the
    reference's ``get_all_files(ftp=True)`` walk (sync.py:77-91).
    ``recursive=False`` mirrors its ``subdirs=False`` top-level mode."""
    ftp = _ftp_connect(host, port, user, password)
    out: list[dict] = []
    try:
        stack = [root.rstrip("/") or "/"]
        while stack:
            d = stack.pop()
            for name, facts in sorted(ftp.mlsd(d)):
                full = posixpath.join(d, name)
                if facts.get("type") == "dir":
                    if recursive:
                        stack.append(full)
                elif facts.get("type") == "file":
                    rel = posixpath.relpath(full, root.rstrip("/") or "/")
                    out.append({"relpath": rel,
                                "length": int(facts.get("size", 0))})
    finally:
        ftp.quit()
    return sorted(out, key=lambda r: r["relpath"])


def ftp_listing_df(spark: SparkSession, host: str, port: int = 21,
                   user: str | None = None, password: str | None = None,
                   root: str = "/", recursive: bool = True) -> DataFrame:
    rows = ftp_list_files(host, port, user, password, root, recursive)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["relpath", "length"]).astype(
            {"relpath": "string", "length": "int64"}
        )
    )


# --------------------------------------------------------------------------
# S3 client (stdlib urllib; unauthenticated S3-compatible REST)
# --------------------------------------------------------------------------

class S3Client:
    """Minimal S3-compatible object client: list / get / put / head —
    the surface the reference uses through boto3 (sync.py:37-122)."""

    def __init__(self, endpoint: str):
        self.endpoint = endpoint.rstrip("/")

    def _url(self, bucket: str, key: str = "", query: str = "") -> str:
        u = f"{self.endpoint}/{quote(bucket)}"
        if key:
            u += "/" + quote(key)
        if query:
            u += "?" + query
        return u

    def bucket_exists(self, bucket: str) -> bool:
        req = Request(self._url(bucket), method="HEAD")
        try:
            with urlopen(req, timeout=30) as r:
                return r.status == 200
        except Exception:
            return False

    def create_bucket(self, bucket: str) -> None:
        req = Request(self._url(bucket), method="PUT")
        urlopen(req, timeout=30).read()

    def ensure_bucket(self, bucket: str) -> None:
        """The reference's head-then-create dance (sync.py:42-54)."""
        if not self.bucket_exists(bucket):
            self.create_bucket(bucket)

    def list_keys(self, bucket: str, prefix: str = "",
                  page_size: int = 1000) -> list[dict]:
        """ListObjectsV2 with continuation-token pagination — unlike the
        reference's single unpaginated ``list_objects`` call
        (sync.py:105), this survives buckets past the 1000-key page."""
        out: list[dict] = []
        token = ""
        while True:
            q = "list-type=2&max-keys=%d&prefix=%s" % (page_size, quote(prefix))
            if token:
                q += "&continuation-token=" + quote(token)
            with urlopen(self._url(bucket, query=q), timeout=30) as r:
                root = ElementTree.fromstring(r.read())
            ns = root.tag[: root.tag.index("}") + 1] if "}" in root.tag else ""
            for c in root.findall(f"{ns}Contents"):
                out.append({
                    "relpath": c.find(f"{ns}Key").text,
                    "length": int(c.find(f"{ns}Size").text),
                })
            token_el = root.find(f"{ns}NextContinuationToken")
            if root.findtext(f"{ns}IsTruncated") == "true" and token_el is not None:
                token = token_el.text
            else:
                return out

    def get(self, bucket: str, key: str) -> bytes:
        with urlopen(self._url(bucket, key), timeout=30) as r:
            return r.read()

    def put(self, bucket: str, key: str, data: bytes) -> None:
        req = Request(self._url(bucket, key), data=data, method="PUT")
        urlopen(req, timeout=30).read()


def s3_listing_df(spark: SparkSession, endpoint: str, bucket: str,
                  prefix: str = "") -> DataFrame:
    rows = S3Client(endpoint).list_keys(bucket, prefix)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["relpath", "length"]).astype(
            {"relpath": "string", "length": "int64"}
        )
    )


# --------------------------------------------------------------------------
# The sync itself: anti-join diff + distributed transfer
# --------------------------------------------------------------------------

def ftp_files_to_sync(spark: SparkSession, *, host: str, port: int = 21,
                      user: str | None = None, password: str | None = None,
                      ftp_dir: str = "/", local_dir: str | None = None,
                      s3_endpoint: str | None = None,
                      s3_bucket: str | None = None,
                      include_size_mismatch: bool = True) -> DataFrame:
    """(relpath, length) present on the FTP tree but absent (or
    size-drifted) at the destination — the reference's
    ``get_files_for_sync`` (sync.py:124-142) as one anti-join. The
    destination is local (``local_dir``) or S3 (``s3_endpoint`` +
    ``s3_bucket``), matching its ``to_s3`` switch."""
    src = ftp_listing_df(spark, host, port, user, password, ftp_dir)
    if s3_bucket is not None:
        if not S3Client(s3_endpoint).bucket_exists(s3_bucket):
            return src
        dst = s3_listing_df(spark, s3_endpoint, s3_bucket)
    else:
        if not os.path.isdir(local_dir) or not os.listdir(local_dir):
            return src
        dst = list_files(spark, local_dir).select("relpath", "length")
    missing = src.join(dst, "relpath", "left_anti")
    if not include_size_mismatch:
        return missing
    drifted = (
        src.alias("s")
        .join(dst.alias("d"), "relpath")
        .filter(F.col("s.length") != F.col("d.length"))
        .select("relpath", F.col("s.length").alias("length"))
    )
    return missing.unionByName(drifted)


def ftp_sync(spark: SparkSession, *, host: str, port: int = 21,
             user: str | None = None, password: str | None = None,
             ftp_dir: str = "/", local_dir: str,
             s3_endpoint: str | None = None, s3_bucket: str | None = None,
             include_size_mismatch: bool = True) -> dict:
    """Download every missing/drifted file from the FTP tree into
    ``local_dir`` — and, when an S3 destination is given, forward each to
    the bucket — returning {'n_files', 'total_bytes'}. This is the
    reference's ``upload_ftp_files`` (sync.py:144-164) with the serial
    driver loop replaced by a per-task transfer: each task holds ONE
    control connection for its whole slice, so connection setup amortizes
    and bandwidth shards across executors."""
    todo = ftp_files_to_sync(
        spark, host=host, port=port, user=user, password=password,
        ftp_dir=ftp_dir, local_dir=local_dir,
        s3_endpoint=s3_endpoint, s3_bucket=s3_bucket,
        include_size_mismatch=include_size_mismatch,
    )
    if s3_bucket is not None:
        S3Client(s3_endpoint).ensure_bucket(s3_bucket)
    dst_abs = os.path.abspath(local_dir)
    os.makedirs(dst_abs, exist_ok=True)
    root = ftp_dir.rstrip("/") or "/"

    def transfer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ftp = None
        s3 = S3Client(s3_endpoint) if s3_bucket is not None else None
        try:
            for b in batches:
                done = []
                for rel in b["relpath"]:
                    if ftp is None:
                        ftp = _ftp_connect(host, port, user, password)
                    local = os.path.join(dst_abs, rel)
                    os.makedirs(os.path.dirname(local), exist_ok=True)
                    with open(local, "wb") as f:
                        ftp.retrbinary(
                            "RETR " + posixpath.join(root, rel), f.write
                        )
                    if s3 is not None:
                        with open(local, "rb") as f:
                            s3.put(s3_bucket, rel, f.read())
                    done.append((rel, os.path.getsize(local)))
                yield pd.DataFrame(done, columns=["relpath", "nbytes"])
        finally:
            if ftp is not None:
                try:
                    ftp.quit()
                except Exception:
                    ftp.close()

    copied = todo.repartition(
        max(spark.sparkContext.defaultParallelism, 1), "relpath"
    ).mapInPandas(transfer, "relpath string, nbytes long")
    row = copied.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("nbytes"), F.lit(0)).alias("b")
    ).first()
    return {"n_files": int(row["n"]), "total_bytes": int(row["b"])}
