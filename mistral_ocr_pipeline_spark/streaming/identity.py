"""Checkpoint-LIFECYCLE identity for the exactly-once streaming modules.

Spark's micro-batch ids are unique only per checkpoint lifecycle: wipe
and recreate the checkpoint dir and ids restart at 0, so lineage keyed
on (path, batch_id) alone would misread a new lifecycle's first batches
as replays of the old run's — silent data loss.  An earlier fix keyed on
the dir's inode, but an inode is NOT a lifecycle marker: ext4 happily
hands the just-freed inode to the immediately-recreated dir (measured in
the quality-route test — rmtree → makedirs with nothing allocated in
between reused the inode and batches were skipped).  The identity is
therefore a UUID MARKER FILE persisted inside the checkpoint dir itself:
it lives and dies with the lifecycle by construction — wiping the
checkpoint destroys the marker, recreating mints a fresh one — and is
filesystem-independent."""

from __future__ import annotations

import os
import uuid

_MARKER = "_stream_identity"


def stream_identity(checkpoint_dir: str) -> str:
    """Stable id for this checkpoint lifecycle: abspath + the UUID marker
    stored in the dir (created on first use, fsynced, atomic rename —
    single-writer per checkpoint, which Spark's own checkpoint locking
    already enforces)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, _MARKER)
    if not os.path.exists(marker):
        tmp = f"{marker}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(uuid.uuid4().hex)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, marker)
    with open(marker) as fh:
        token = fh.read().strip()
    return f"{os.path.abspath(checkpoint_dir)}#{token}"
