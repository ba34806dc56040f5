"""In-process protocol stubs (loopback-only) used to drive the FTP/S3
sync legs end-to-end without network access: a minimal RFC 959/3659 FTP
server and an S3-shaped HTTP object store, both pure stdlib."""

from .stubs import StubFTPServer, StubS3Server  # noqa: F401
