"""DeviceBatchCache: HBM-resident dataset cache for transfer-bound small
datasets (fdm_tpu/data/device_cache.py). Content must match the streaming
collation exactly; epochs reshuffle order only; fp16 mode casts back to
fp32 on yield; the size guard refuses over-budget datasets."""

import numpy as np
import pytest

from fdm_tpu.configs import vocaset_config
from fdm_tpu.data import batch_iterator
from fdm_tpu.data.device_cache import DeviceBatchCache
from fdm_tpu.data.synthetic import synthetic_splits


def _records(n=7, seed=3):
    cfg = vocaset_config()
    return cfg, synthetic_splits(
        cfg, num_train=n, num_eval=2, min_frames=8, max_frames=16,
        seed=seed, mode="correlated",
    ).train


def test_cache_matches_streaming_collation_exactly():
    cfg, recs = _records()
    kw = dict(bucket=8, max_frames=16, fps=cfg.dataset.fps,
              include_audio=True, seed=5)
    cache = DeviceBatchCache.from_records(
        recs, 2, lambda b: b, **kw,
    )
    stream = list(batch_iterator(recs, 2, shuffle=True, **kw))
    assert cache.num_batches == len(stream)
    # epoch yields the same batches (possibly reordered); match by the
    # motion tensor's bytes
    def key(b):
        return np.asarray(b["motion"]).tobytes()

    cached = {key(b): b for b in cache.epoch(0)}
    assert len(cached) == len(stream)
    for sb in stream:
        cb = cached[key(sb)]
        assert set(cb) == set(sb)
        for k in sb:
            np.testing.assert_array_equal(
                np.asarray(cb[k]), np.asarray(sb[k]), err_msg=k
            )


def test_epochs_reshuffle_order_not_content():
    cfg, recs = _records()
    cache = DeviceBatchCache.from_records(
        recs, 2, lambda b: b, bucket=8, max_frames=16,
        fps=cfg.dataset.fps, include_audio=False, seed=0,
    )

    def order(seed):
        return [np.asarray(b["motion"]).tobytes()
                for b in cache.epoch(seed)]

    e1, e2 = order(1), order(2)
    assert sorted(e1) == sorted(e2), "content changed across epochs"
    assert e1 != e2, "order did not reshuffle"


def test_half_mode_casts_back_to_fp32_with_fp16_error():
    cfg, recs = _records()
    cache = DeviceBatchCache.from_records(
        recs, 2, lambda b: b, bucket=8, max_frames=16,
        fps=cfg.dataset.fps, include_audio=True, seed=0,
        half=True, half_keys=("motion", "audio", "template"),
    )
    stream = list(batch_iterator(
        recs, 2, bucket=8, max_frames=16, fps=cfg.dataset.fps,
        include_audio=True, shuffle=True, seed=0,
    ))
    got = {np.asarray(b["motion"]).astype(np.float16).tobytes(): b
           for b in cache.epoch(0)}
    for sb in stream:
        cb = got[np.asarray(sb["motion"]).astype(np.float16).tobytes()]
        for k in ("motion", "audio", "template"):
            a = np.asarray(cb[k])
            assert a.dtype == np.float32, f"{k} not cast back"
            np.testing.assert_array_equal(
                a, np.asarray(sb[k]).astype(np.float16).astype(np.float32),
                err_msg=k,
            )
        # non-half keys stay exact
        np.testing.assert_array_equal(
            np.asarray(cb["style_one_hot"]),
            np.asarray(sb["style_one_hot"]),
        )


def test_epoch_stacked_covers_every_batch_once():
    """Stacked chunks for multi-step dispatch: same-shape batches grouped,
    chunk sizes <= K, every cached batch appears exactly once per epoch,
    fp16 leaves cast back."""
    import numpy as np

    cfg, recs = _records(n=9)
    cache = DeviceBatchCache.from_records(
        recs, 2, lambda b: b, bucket=8, max_frames=16,
        fps=cfg.dataset.fps, include_audio=True, seed=0,
        half=True, half_keys=("motion",),
    )
    singles = {np.asarray(b["motion"]).tobytes() for b in cache.epoch(0)}
    seen = []
    total = 0
    for stacked, n in cache.epoch_stacked(3, k=2):
        assert n <= 2
        m = np.asarray(stacked["motion"])
        assert m.dtype == np.float32  # cast back on yield
        assert m.shape[0] == n
        total += n
        for row in range(n):
            seen.append(
                np.asarray({k: v[row] for k, v in stacked.items()}
                           ["motion"]).tobytes()
            )
    assert total == cache.num_batches
    assert set(seen) == singles and len(seen) == len(singles)


def test_max_bytes_guard_refuses_oversized_cache():
    cfg, recs = _records()
    with pytest.raises(ValueError, match="max_bytes"):
        DeviceBatchCache.from_records(
            recs, 2, lambda b: b, bucket=8, max_frames=16,
            fps=cfg.dataset.fps, include_audio=True, seed=0,
            max_bytes=128,
        )


def test_empty_cache_raises():
    with pytest.raises(ValueError, match="zero batches"):
        DeviceBatchCache([])


def test_epoch_stacked_release_and_raw_fp16_yield():
    """The scan-dispatch memory regime: cast_back=False yields the stored
    fp16 leaves untouched (the scan body casts its per-step slice), and
    release_batches=True frees the per-batch device buffers — the stacked
    copies otherwise pin the dataset in HBM twice. epoch() must then fail
    loudly rather than iterate deleted buffers."""
    import numpy as np

    cfg, recs = _records(n=6)
    cache = DeviceBatchCache.from_records(
        recs, 2, lambda b: b, bucket=8, max_frames=16,
        fps=cfg.dataset.fps, include_audio=True, seed=0,
        half=True, half_keys=("motion",),
    )
    fp32_rows = {np.asarray(b["motion"]).astype(np.float16).tobytes()
                 for b in cache.epoch(0)}
    seen = set()
    for stacked, n in cache.epoch_stacked(
        1, k=2, cast_back=False, release_batches=True
    ):
        m = np.asarray(stacked["motion"])
        assert m.dtype == np.float16  # raw storage dtype, no yield cast
        for row in range(n):
            seen.add(m[row].tobytes())
    assert seen == fp32_rows
    # released: per-batch iteration is gone, stacked epochs still work
    with pytest.raises(RuntimeError, match="released"):
        next(cache.epoch(1))
    again = sum(n for _, n in cache.epoch_stacked(2, k=2, cast_back=False))
    assert again == cache.num_batches


def test_release_spares_shared_device_arrays():
    """The cache must not destroy buffers it does not own: device-resident
    inputs pass through jnp.asarray/device_put UNCOPIED, so a leaf shared
    with the caller (e.g. FlameDecoder's cached template decode, reused by
    every eval batch) is the SAME buffer as the cached one. The old
    explicit .delete() in release_batches crashed the next eval of any
    non-half cached run with "Array has been deleted"."""
    import jax.numpy as jnp

    cfg, recs = _records(n=4)
    shared_template = jnp.zeros((1, 1, recs[0].motion.shape[1]))

    def prepare(b):
        out = dict(b)
        out["template"] = shared_template  # aliased, like decode_motion
        return out

    cache = DeviceBatchCache.from_records(
        recs, 1, prepare, bucket=8, max_frames=16,
        fps=cfg.dataset.fps, include_audio=False, seed=0,
    )
    for _ in cache.epoch_stacked(0, k=2, release_batches=True):
        pass
    # the shared array must still be alive and usable after the release
    assert float(jnp.sum(shared_template + 1.0)) == shared_template.size
