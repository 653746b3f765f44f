"""Single-writer ownership of stored artifacts (round-9 verdict #4).

Every stored artifact (MinHash / text / IVF / phash / passage index,
DSIR model, n-gram LM) commits its folds through a read-modify-write
manifest flip and allocates ``batch=<epoch>`` data dirs, so the
manifests assume ONE writer: two writers interleaving — two sinks
pointed at the same artifact dir, or a sink plus a manual ``update_*``
— can interleave manifest flips and silently lose one side's commit
(the loser's ``n_docs``/``last_epoch``/version bump vanishes under the
winner's flip).

The DSIR model sink already refuses foreign checkpoints
(operators/dsir.py — a model stamped by one checkpoint refuses epochs
from another, because epoch ids are only comparable within one
checkpoint).  This module threads the same writer-identity token — the
streaming sink's checkpoint path — through every other artifact
family's fold path:

- A streaming fold passes ``checkpoint=``; the first fold (or the
  sink's bootstrap build) stamps ``epoch_checkpoint`` into the
  manifest, and every later fold must match it — a SECOND sink folding
  into the same artifact refuses loudly.
- A manual fold (no ``checkpoint``) against a sink-owned artifact
  refuses loudly: stop the stream and pass its checkpoint to act on
  its behalf, or rebuild the artifact into a fresh dir to transfer
  ownership.
- Manual folds against an unowned artifact stay free (the pre-sink
  batch workflow), and reads, deletes/tombstones and compactions never
  claim ownership — a takedown must work against a live sink's
  artifact, and tombstones commit by atomic swap, not a manifest flip.
- Refits and the LM's staged rebuild CARRY the stamp (maintenance of
  the same deployment, like ``last_epoch``).

The single-writer contract for maintenance remains: run ``compact_*``
/ ``refit_*`` either from the owning sink's own cadence hooks or with
the stream stopped.
"""

from __future__ import annotations

import json
import os


def claim_writer(meta: dict, checkpoint: str | None, artifact: str) -> None:
    """Enforce-and-record the writer identity in ``meta`` (the caller
    flips the manifest that carries it, so the stamp commits with the
    fold it covers).  Raises on a foreign writer BEFORE the caller
    touches any data dir."""
    stored = meta.get("epoch_checkpoint")
    if checkpoint is not None:
        ck = os.path.abspath(checkpoint)
        if stored is not None and stored != ck:
            raise RuntimeError(
                f"the {artifact} is owned by the streaming sink checkpointed "
                f"at {stored!r}; refusing a fold from {ck!r} — two writers "
                "interleaving manifest flips would silently lose one side's "
                "commit.  Point this stream at its own artifact dir, or "
                "rebuild the artifact fresh to transfer ownership"
            )
        meta["epoch_checkpoint"] = ck
    elif stored is not None:
        raise RuntimeError(
            f"the {artifact} is owned by the streaming sink checkpointed at "
            f"{stored!r}; refusing an unattributed manual fold.  Stop the "
            "stream and pass checkpoint=<that path> to act on its behalf, "
            "or rebuild the artifact into a fresh dir"
        )


def stamp_file(manifest_path: str, checkpoint: str) -> None:
    """Stamp an already-written manifest FILE with the sink's writer
    identity — the bootstrap hook: a sink that builds its artifact via
    the batch ``build_*`` (which writes an unowned manifest) claims it
    in the same epoch, closing the window where a manual fold could
    slip between the build and the first streamed update.  Atomic
    replace, same as every manifest flip."""
    with open(manifest_path) as fh:
        meta = json.load(fh)
    claim_writer(meta, checkpoint, manifest_path)
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, manifest_path)
