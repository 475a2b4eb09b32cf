"""Training checkpoint save/restore (orbax-backed, sharding-aware).

The reference has load-only inference checkpoints (SURVEY.md §5); this
module adds the training-direction subsystem: periodic async checkpoints of
the full :class:`~videoprism_tpu.train.TrainState` (params, optimizer
moments, step, temperature) that restore *directly into a sharded layout*
on a different mesh shape if needed — orbax handles resharding from the
target shardings passed at restore time.
"""

from __future__ import annotations

from typing import Any

import jax
import orbax.checkpoint as ocp


class TrainCheckpointer:
  """Thin orbax CheckpointManager wrapper for TrainState pytrees.

  Example::

      ckpt = TrainCheckpointer('/path/ckpts', max_to_keep=3)
      for step in range(...):
        state, metrics = train_step(state, batch, rng)
        ckpt.maybe_save(int(state.step), state, every=1000)
      state = ckpt.restore_latest(state)   # template gives structure+sharding
  """

  def __init__(self, directory: str, max_to_keep: int = 3,
               async_save: bool = True):
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, enable_async_checkpointing=async_save)
    self._manager = ocp.CheckpointManager(directory, options=options)

  def save(self, step: int, state: Any) -> None:
    self._manager.save(step, args=ocp.args.StandardSave(state))

  def maybe_save(self, step: int, state: Any, every: int) -> bool:
    if every <= 0 or step % every:
      return False
    self.save(step, state)
    return True

  def latest_step(self) -> int | None:
    return self._manager.latest_step()

  def restore(self, step: int, template: Any) -> Any:
    """Restores into the template's structure/shardings (reshard-on-load)."""
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return self._manager.restore(
        step, args=ocp.args.StandardRestore(abstract))

  def restore_latest(self, template: Any) -> Any | None:
    step = self.latest_step()
    if step is None:
      return None
    return self.restore(step, template)

  def wait(self) -> None:
    self._manager.wait_until_finished()

  def close(self) -> None:
    self._manager.close()
