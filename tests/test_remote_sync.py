"""S13 FTP/S3 sync legs driven for real against in-process loopback
servers (no network, no monkeypatching): the distributed per-task FTP
download path and the S3 forward/list path are the code under test.
Mirrors the reference's FTPSync flow (sync.py:124-164): list remote,
diff against local or S3, transfer the difference."""

import os

import pytest

from d6tstack_spark.sources.remote import (
    S3Client,
    ftp_files_to_sync,
    ftp_list_files,
    ftp_sync,
)
from d6tstack_spark.testing import StubFTPServer, StubS3Server


@pytest.fixture()
def ftp_tree(tmp_path):
    src = tmp_path / "ftp_root"
    (src / "sub" / "deep").mkdir(parents=True)
    files = {
        "a.csv": b"x,y\n1,2\n",
        "sub/b.csv": b"x,y\n3,4\n" * 10,
        "sub/deep/c.bin": bytes(range(256)) * 50,
    }
    for rel, data in files.items():
        (src / rel).write_bytes(data)
    return src, files


def test_ftp_listing_recursive_and_flat(ftp_tree):
    src, files = ftp_tree
    with StubFTPServer(str(src), user="u", password="p") as srv:
        rows = ftp_list_files(srv.host, srv.port, "u", "p", "/")
        assert {r["relpath"]: r["length"] for r in rows} == {
            k: len(v) for k, v in files.items()
        }
        flat = ftp_list_files(srv.host, srv.port, "u", "p", "/", recursive=False)
        assert [r["relpath"] for r in flat] == ["a.csv"]


def test_ftp_sync_to_local_distributed(spark, ftp_tree, tmp_path):
    src, files = ftp_tree
    dst = tmp_path / "mirror"
    with StubFTPServer(str(src)) as srv:
        res = ftp_sync(spark, host=srv.host, port=srv.port,
                       local_dir=str(dst))
        assert res == {"n_files": 3,
                       "total_bytes": sum(len(v) for v in files.values())}
        for rel, data in files.items():
            assert (dst / rel).read_bytes() == data
        # idempotent: a second sync finds nothing to do
        res2 = ftp_sync(spark, host=srv.host, port=srv.port,
                        local_dir=str(dst))
        assert res2 == {"n_files": 0, "total_bytes": 0}
        # size drift at the destination is detected and re-pulled
        (dst / "a.csv").write_bytes(b"stale")
        res3 = ftp_sync(spark, host=srv.host, port=srv.port,
                        local_dir=str(dst))
        assert res3["n_files"] == 1
        assert (dst / "a.csv").read_bytes() == files["a.csv"]


def test_ftp_sync_to_s3(spark, ftp_tree, tmp_path):
    src, files = ftp_tree
    with StubFTPServer(str(src)) as srv, StubS3Server() as s3srv:
        res = ftp_sync(spark, host=srv.host, port=srv.port,
                       local_dir=str(tmp_path / "stage"),
                       s3_endpoint=s3srv.endpoint, s3_bucket="sync")
        assert res["n_files"] == 3
        assert s3srv.objects("sync") == files
        # S3-side diff: only the missing key is listed for sync
        c = S3Client(s3srv.endpoint)
        extra = {**files, "new/d.txt": b"fresh"}
        (src / "new").mkdir()
        (src / "new/d.txt").write_bytes(extra["new/d.txt"])
        todo = ftp_files_to_sync(spark, host=srv.host, port=srv.port,
                                 local_dir=str(tmp_path / "stage"),
                                 s3_endpoint=s3srv.endpoint,
                                 s3_bucket="sync")
        assert [r.relpath for r in todo.collect()] == ["new/d.txt"]
        res2 = ftp_sync(spark, host=srv.host, port=srv.port,
                        local_dir=str(tmp_path / "stage"),
                        s3_endpoint=s3srv.endpoint, s3_bucket="sync")
        assert res2["n_files"] == 1
        assert s3srv.objects("sync") == extra
        assert c.get("sync", "new/d.txt") == b"fresh"


def test_s3_pagination_roundtrip():
    with StubS3Server() as s3srv:
        c = S3Client(s3srv.endpoint)
        assert not c.bucket_exists("b")
        c.ensure_bucket("b")
        assert c.bucket_exists("b")
        keys = {"k%03d" % i: b"v%d" % i for i in range(25)}
        for k, v in keys.items():
            c.put("b", k, v)
        # force the client through its continuation-token loop
        listed = c.list_keys("b", page_size=7)
        assert {r["relpath"]: r["length"] for r in listed} == {
            k: len(v) for k, v in keys.items()
        }
        assert listed == sorted(listed, key=lambda r: r["relpath"])
        assert [r["relpath"] for r in c.list_keys("b", prefix="k01")] == [
            "k%03d" % i for i in range(10, 20)
        ]


def test_ftp_sync_many_files_distributed(spark, tmp_path):
    """60 files across nested dirs: the transfer runs as multiple tasks
    (repartition on relpath), every byte lands, and the S3 listing pages
    through the diff correctly on the rerun."""
    src = tmp_path / "big_root"
    files = {}
    for i in range(60):
        rel = f"d{i % 5}/f{i:03d}.bin"
        (src / f"d{i % 5}").mkdir(parents=True, exist_ok=True)
        data = bytes([i]) * (100 + i)
        (src / rel).write_bytes(data)
        files[rel] = data
    with StubFTPServer(str(src)) as srv, StubS3Server() as s3srv:
        res = ftp_sync(spark, host=srv.host, port=srv.port,
                       local_dir=str(tmp_path / "stage"),
                       s3_endpoint=s3srv.endpoint, s3_bucket="bulk")
        assert res == {"n_files": 60,
                       "total_bytes": sum(len(v) for v in files.values())}
        assert s3srv.objects("bulk") == files
        # S3-side size drift is detected and re-pushed
        c = S3Client(s3srv.endpoint)
        c.put("bulk", "d0/f000.bin", b"truncated")
        res2 = ftp_sync(spark, host=srv.host, port=srv.port,
                        local_dir=str(tmp_path / "stage2"),
                        s3_endpoint=s3srv.endpoint, s3_bucket="bulk")
        assert res2["n_files"] == 1
        assert s3srv.objects("bulk") == files


def test_ftp_bad_login_rejected(ftp_tree):
    src, _ = ftp_tree
    import ftplib

    with StubFTPServer(str(src), user="u", password="p") as srv:
        with pytest.raises(ftplib.error_perm):
            ftp_list_files(srv.host, srv.port, "u", "WRONG", "/")
