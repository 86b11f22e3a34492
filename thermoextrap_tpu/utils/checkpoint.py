"""Orbax checkpoint adapter: async, sharded-aware pytree checkpointing.

The npz seam (:meth:`data.DataCentralMoments.save` and the GPR
``save_params``/``active_history.npz`` files, mirroring the reference's
checkpoint role at /root/reference/src/thermoextrap/gpr_active/
active_utils.py:2235-2243) is single-host and synchronous: it gathers every
array to host memory and blocks the producer while writing.  That is the
right tool for the small moment/parameter states it was built for.  This
adapter covers the cases the npz seam cannot:

- **Sharded states** (multi-chip streaming over a ``jax.sharding.Mesh``):
  orbax writes each array shard from the device that owns it and restores
  to the sharding of the target template — no host gather, no single-host
  memory spike.
- **Async saves**: :class:`AsyncPytreeSaver` overlaps the checkpoint write
  with continued ingest (the streaming ``update`` keeps dispatching while
  the previous state serializes).
- **Arbitrary registered pytrees**: streaming-interp state lists, GPR
  parameter dicts, whole ``DataCentralMoments`` states — anything whose
  leaves are arrays.  Static pytree metadata (moment order, flags, meta
  callbacks) lives in the tree *structure* and is reconstructed from the
  ``like`` template on restore, exactly as ``jax.jit`` reconstructs it.

Orbax is an optional runtime dependency of this module only; importing the
package without orbax installed stays cheap and working.
"""

from __future__ import annotations

import os

__all__ = ["AsyncPytreeSaver", "restore_pytree", "save_pytree"]


def _ocp():
    try:
        import orbax.checkpoint as ocp
    except ImportError as err:  # pragma: no cover - orbax is in the image
        msg = (
            "orbax-checkpoint is required for utils.checkpoint; the npz "
            "seam (DataCentralMoments.save/load) has no extra dependency"
        )
        raise ImportError(msg) from err
    return ocp


def _norm(path) -> str:
    # orbax requires absolute directory paths
    return os.path.abspath(str(path))


def save_pytree(path, tree, *, force: bool = True) -> None:
    """Checkpoint a pytree of arrays to the directory ``path`` (created).

    Sharded ``jax.Array`` leaves are written shard-by-shard from their own
    devices.  ``force=True`` (default) overwrites an existing checkpoint at
    ``path`` — checkpoint rotation is the caller's policy.
    """
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_norm(path), tree, force=force)


def restore_pytree(path, like):
    """Restore a pytree checkpointed by :func:`save_pytree`.

    ``like`` is the structure template: a pytree matching the saved one,
    with leaves that are concrete arrays or ``jax.ShapeDtypeStruct``s.
    Each restored leaf takes its dtype and (if the template leaf carries
    one) its sharding from the template — restoring a state saved from an
    8-device mesh onto a different mesh is just a different ``like``.
    Static pytree metadata comes from ``like``'s structure.

    Example: ``restore_pytree(p, DataCentralMoments.zeros(order))``.
    """
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(_norm(path), like)


class AsyncPytreeSaver:
    """Background checkpoint writer: ``save`` returns as soon as the arrays
    are snapshotted; serialization runs on a worker thread so a streaming
    producer keeps ingesting.

    Saves issued to the SAME saver serialize among themselves (each
    ``save`` waits for the previous write to finish first — orbax
    semantics); ``wait()`` blocks until the last issued save is durable;
    ``close()`` waits and releases the worker.  Usable as a context
    manager.
    """

    def __init__(self):
        ocp = _ocp()
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path, tree, *, force: bool = True) -> None:
        self._ckptr.save(_norm(path), args=self._args(tree), force=force)

    def _args(self, tree):
        ocp = _ocp()
        return ocp.args.StandardSave(tree)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.close()
