"""SRC-13/14: SFTP landing-zone fetch + directory-stability gate.

Spark has no SFTP source; like the reference, the transfer is a
driver-side pre-stage into a local landing dir which the file sources
then read (`sftp_download.py:28-61`, `sftp_wait_for_stable.py:21-49`).
paramiko is not installed in this container — the client is created via
an injectable factory and tests drive the gate logic with a fake.

Scale note: the gate + fetch is O(files) driver work and happens once
per run before any Spark job; the cluster never blocks on it.
"""

from __future__ import annotations

import os
import stat
import time
from collections.abc import Callable


def make_paramiko_factory(host: str, username: str, key_path: str,
                          port: int = 22) -> Callable[[], object]:
    """Returns a factory producing a connected SFTP client, or raises
    ImportError where paramiko is unavailable (import-gated)."""
    import paramiko  # not in this container; gate at call time

    def factory():
        transport = paramiko.Transport((host, port))
        transport.connect(username=username,
                          pkey=paramiko.RSAKey.from_private_key_file(key_path))
        return paramiko.SFTPClient.from_transport(transport)

    return factory


def snapshot_dir(sftp, remote_dir: str) -> dict[str, tuple[int, float]]:
    """{name: (size, mtime)} for regular files (the gate's fingerprint,
    sftp_wait_for_stable.py:30-38)."""
    out = {}
    for attr in sftp.listdir_attr(remote_dir):
        if not stat.S_ISDIR(attr.st_mode):
            out[attr.filename] = (attr.st_size, attr.st_mtime)
    return out


def wait_for_stable(sftp, remote_dir: str, poll_seconds: int = 60,
                    max_polls: int = 60,
                    sleep: Callable[[float], None] = time.sleep) -> bool:
    """SRC-14: proceed only when two consecutive snapshots are identical
    (files are no longer being written). Poll cadence matches the
    reference's 60 s (`sftp_wait_for_stable.py:47`)."""
    prev = snapshot_dir(sftp, remote_dir)
    for _ in range(max_polls):
        sleep(poll_seconds)
        cur = snapshot_dir(sftp, remote_dir)
        if cur == prev:
            return True
        prev = cur
    return False


def download_all(sftp, remote_dir: str, local_dir: str,
                 delete_after: bool = False) -> list[str]:
    """SRC-13: fetch every file with size verification, optionally
    deleting the remote after a verified transfer
    (`sftp_download.py:28-61`)."""
    os.makedirs(local_dir, exist_ok=True)
    fetched = []
    for name, (size, _mtime) in snapshot_dir(sftp, remote_dir).items():
        remote_path = f"{remote_dir.rstrip('/')}/{name}"
        local_path = os.path.join(local_dir, name)
        sftp.get(remote_path, local_path)
        local_size = os.path.getsize(local_path)
        if local_size != size:
            raise IOError(
                f"size mismatch for {name}: remote={size} local={local_size}")
        fetched.append(local_path)
        if delete_after:
            sftp.remove(remote_path)
    return fetched
