"""HBM-resident dataset cache for small datasets (synthetic rehearsals,
few-subject corpora like BIWI/VOCASET).

The vertex-space datasets are HOST->DEVICE TRANSFER-BOUND in training:
one batch-8 BIWI motion tensor is ~135 MB fp16, so even with the C++
prefetch ring overlapping copies, the step rate is pinned to the link
(~50 MB/s over remote-attached TPUs — measured 3.2 steps/s at batch 1,
round-3 rehearsals), while the compute itself runs at 10+ steps/s. The
reference's torch DataLoader has the same structure (host loader feeding
a device) and the same bound on its hardware.

For datasets that FIT in device memory there is a strictly better plan:
collate every batch ONCE, `jax.device_put` the whole epoch, and feed the
step device handles — the steady-state host traffic drops to zero and
the step rate returns to compute-bound. 256 clips of 120-frame VOCASET
vertices are ~1.9 GB fp32; BIWI is ~8.6 GB fp32 / 4.3 GB fp16 — all
within a 16 GB chip alongside the train state.

Trade-off vs streaming: batch COMPOSITION is fixed after the first
collation (the per-epoch reshuffle permutes batch ORDER only). This is
the standard cached-batching trade and is irrelevant for batch_size 1;
callers who need per-epoch recomposition should stream instead.

`half` stores float32 leaves as float16 and casts back on yield (on
device, so the cast is an XLA op, not a transfer). fp16 vertex data is
not a departure from parity: the reference's own loaders round-trip
vertices through fp16 (datasets/data_loader.py:42-43, quirk Q9).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

__all__ = ["DeviceBatchCache"]


class DeviceBatchCache:
    """Build once from an iterable of host/device batch dicts; iterate per
    epoch in a reshuffled order with every leaf already device-resident."""

    def __init__(
        self,
        batches: Sequence[Dict],
        half: bool = False,
        half_keys: Optional[Sequence[str]] = None,
        max_bytes: Optional[int] = None,
    ):
        import jax
        import jax.numpy as jnp

        self._cast_back: Dict[int, List[str]] = {}
        cached = []
        total = 0
        for i, batch in enumerate(batches):
            out = {}
            back = []
            for k, v in batch.items():
                arr = jnp.asarray(v)
                if (
                    half
                    and arr.dtype == jnp.float32
                    and (half_keys is None or k in half_keys)
                ):
                    arr = arr.astype(jnp.float16)
                    back.append(k)
                total += arr.size * arr.dtype.itemsize
                if max_bytes is not None and total > max_bytes:
                    raise ValueError(
                        f"device cache would exceed max_bytes="
                        f"{max_bytes} at batch {i} "
                        f"({total} bytes so far) — stream this dataset "
                        f"instead, or pass half=True"
                    )
                out[k] = jax.device_put(arr)
            self._cast_back[i] = back
            cached.append(out)
        if not cached:
            raise ValueError("device cache built from zero batches")
        self._batches = cached
        self.num_batches = len(cached)
        self.nbytes = total

    def _shape_key(self, i: int):
        b = self._batches[i]
        return tuple(sorted(
            (k, tuple(v.shape), str(v.dtype)) for k, v in b.items()
        ))

    def stacked_chunks(self, k: int, release_batches: bool = False) -> None:
        """Pre-stack the cached batches into (K, ...) chunks of same-shape
        batches for multi-step dispatch (train.make_multi_step). Chunk
        membership is fixed (like batch composition); epochs permute chunk
        order. Stacking happens ONCE, on device; remainder groups become
        one shorter chunk each, so at most two program shapes compile per
        bucket group.

        `release_batches`: the stacked chunks are COPIES — a caller that
        commits to stacked dispatch otherwise pins the whole dataset in
        HBM twice (1.85 GB of dead per-batch buffers in the full-size MEAD
        rehearsal, the margin that OOMed the resumed stage-2 run). When
        set, the cache's references to the per-batch device buffers are
        dropped after stacking (freeing every buffer not shared with the
        caller) and `epoch()` becomes unavailable."""
        if getattr(self, "_chunks", None) is not None and self._chunk_k == k:
            if release_batches:
                self._release_batches()
            return
        import jax.numpy as jnp

        if self._batches is None:
            raise RuntimeError(
                "per-batch buffers were released; stacked_chunks can only "
                "re-stack with the same k"
            )
        groups: Dict = {}
        for i in range(self.num_batches):
            groups.setdefault(self._shape_key(i), []).append(i)
        chunks = []
        for idxs in groups.values():
            for s in range(0, len(idxs), k):
                part = idxs[s : s + k]
                stacked = {
                    key: jnp.stack([self._batches[i][key] for i in part])
                    for key in self._batches[part[0]]
                }
                back = self._cast_back[part[0]]
                chunks.append((stacked, len(part), back))
        self._chunks = chunks
        self._chunk_k = k
        if release_batches:
            self._release_batches()

    def _release_batches(self) -> None:
        # drop the references and let refcounting free the device buffers:
        # an explicit .delete() here destroyed arrays the cache does NOT
        # own — jnp.asarray/device_put pass already-device-resident inputs
        # through UNCOPIED, so e.g. FlameDecoder's cached template decode
        # is the SAME buffer as the cached batch leaf, and deleting it
        # crashed the next eval ("Array has been deleted") in any
        # non-`half` cached run (half casts fp32->fp16, which copies and
        # masked the aliasing)
        self._batches = None

    def epoch_stacked(
        self, seed: int, k: int, cast_back: bool = True,
        release_batches: bool = False,
    ) -> Iterator:
        """Yield (stacked_batches, n_steps) chunks covering every cached
        batch once, order shuffled by `seed`.

        `cast_back=True` casts fp16 leaves to fp32 at yield time. With
        multi-chunk dispatch in flight that materializes every in-flight
        chunk at fp32 (~2x the whole dataset in transients); pass
        cast_back=False and let the scanned step body cast its per-step
        SLICE instead (train.make_multi_step's cast_f32_keys), bounding
        the fp32 transient to one batch."""
        import jax.numpy as jnp

        self.stacked_chunks(k, release_batches=release_batches)
        order = np.random.RandomState(seed).permutation(len(self._chunks))
        for i in order:
            stacked, n, back = self._chunks[int(i)]
            if cast_back and back:
                stacked = {
                    key: (v.astype(jnp.float32) if key in back else v)
                    for key, v in stacked.items()
                }
            yield stacked, n

    def epoch(self, seed: int) -> Iterator[Dict]:
        """Yield every cached batch once, order shuffled by `seed`; fp16
        leaves are cast back to fp32 on device."""
        import jax.numpy as jnp

        if self._batches is None:
            raise RuntimeError(
                "per-batch buffers were released by "
                "stacked_chunks(release_batches=True); use epoch_stacked"
            )
        order = np.random.RandomState(seed).permutation(self.num_batches)
        for i in order:
            batch = self._batches[int(i)]
            back = self._cast_back[int(i)]
            if back:
                batch = {
                    k: (v.astype(jnp.float32) if k in back else v)
                    for k, v in batch.items()
                }
            yield batch

    @staticmethod
    def from_records(
        records,
        batch_size: int,
        prepare: Callable[[Dict], Dict],
        *,
        bucket: int,
        max_frames: int,
        fps: int,
        sr: int = 16000,
        include_audio: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        half: bool = False,
        half_keys: Optional[Sequence[str]] = None,
        max_bytes: Optional[int] = None,
    ) -> "DeviceBatchCache":
        """Collate `records` with the standard bucketed iterator (one fixed
        composition draw), run each batch through `prepare` (e.g. FLAME
        decode / audio-hidden precompute), and pin the results."""
        from fdm_tpu.data.common import batch_iterator

        it = batch_iterator(
            records, batch_size, bucket=bucket, max_frames=max_frames,
            sr=sr, fps=fps, include_audio=include_audio, shuffle=True,
            seed=seed, drop_last=drop_last,
        )
        return DeviceBatchCache(
            [prepare(b) for b in it],
            half=half, half_keys=half_keys, max_bytes=max_bytes,
        )
