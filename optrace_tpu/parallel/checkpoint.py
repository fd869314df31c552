"""Checkpoint/resume for long megabatched renders.

The reference's only persistence is RenderImage.save/load; its iterative
render restarts from scratch on interruption (SURVEY.md §5). Here a render
job periodically saves the accumulated detector tiles plus the RNG batch
counter, so a 10⁸⁺-ray render survives preemption and resumes exactly
(same threefry keys → same remaining batches).
"""

import os

import numpy as np
import jax


class RenderCheckpoint:
    """Additive image accumulator with .npz checkpointing.

    Usage::

        ck = RenderCheckpoint("render.ckpt.npz", total_batches=100)
        render, _ = make_fused_render(RT, N_batch, ...)
        step = jax.jit(render)
        for i in ck.remaining():
            ck.add(step(ck.key(i)))
            if i % 10 == 9:
                ck.save()
        img = ck.image()
    """

    def __init__(self, path: str = None, total_batches: int = 1, seed: int = 0) -> None:
        self.path = path
        self.total_batches = int(total_batches)
        self.seed = int(seed)
        self._img = None
        self._done = 0
        if path is not None and os.path.isfile(path):
            self.load()

    # ------------------------------------------------------------------
    def key(self, batch_index: int):
        """Per-batch PRNG key, independent of completion order."""
        return jax.random.fold_in(jax.random.PRNGKey(self.seed), batch_index)

    def remaining(self):
        """Iterator over the batch indices still to run."""
        return range(self._done, self.total_batches)

    @property
    def done(self) -> int:
        return self._done

    def add(self, tile) -> None:
        """Accumulate one rendered (Ny, Nx, 4) tile."""
        tile = np.asarray(tile, dtype=np.float64)
        if self._img is None:
            self._img = tile.copy()
        else:
            self._img += tile
        self._done += 1

    # ------------------------------------------------------------------
    def save(self) -> None:
        tmp = self.path + ".tmp.npz"
        np.savez_compressed(tmp, img=self._img, done=self._done,
                            total=self.total_batches, seed=self.seed)
        os.replace(tmp, self.path)

    def load(self) -> None:
        with np.load(self.path) as d:
            self._img = d["img"]
            self._done = int(d["done"])
            if int(d["total"]) != self.total_batches or int(d["seed"]) != self.seed:
                raise ValueError("Checkpoint was created with a different "
                                 "batch count or seed.")

    def image(self, scale: float = None) -> np.ndarray:
        """Accumulated XYZW image; scaled by 1/total_batches by default so
        batch weights sum to the true source power."""
        if self._img is None:
            raise RuntimeError("No batches accumulated.")
        s = scale if scale is not None else 1.0 / self.total_batches
        return self._img * s
