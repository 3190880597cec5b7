"""Checkpointing via orbax: params + optimizer state + step in one atomic
save, with retention. Replaces the reference's torch.save({'epoch','model',
'opt'}) .mpt files (train/train_mead_vqvae.py:147-153) — and unlike the
reference, restore brings back the optimizer state too (the reference
comments that out, train/train_diffusion_mead.py:178-181).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any):
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if target is not None:
            return self.manager.restore(
                step, args=ocp.args.StandardRestore(target)
            )
        return self.manager.restore(step)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def close(self):
        self.manager.close()
