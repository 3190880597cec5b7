"""Sharded inference: batched generation data-parallel over the mesh must
equal single-device generation (same keys, same params)."""

import jax
import jax.numpy as jnp
import numpy as np

from fdm_tpu.parallel import batch_sharding, make_mesh, replicated_sharding

from test_pipeline import tiny_pipeline, init_pipeline


def test_sharded_generate_matches_single_device():
    cfg = tiny_pipeline()
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    B = 8
    T = motion.shape[1]
    key = jax.random.PRNGKey(7)
    audio8 = jnp.tile(audio[:1], (B, 1, 1))
    template8 = jnp.tile(template[:1], (B, 1, 1))
    style8 = jnp.eye(cfg.fdm.style_classes)[jnp.arange(B) % cfg.fdm.style_classes]
    emo8 = jnp.eye(7)[jnp.arange(B) % 7]

    def generate(vq_p, fdm_p, k, audio, tmpl, style, emo):
        return ld.generate(
            vq_p, fdm_p, k, audio, tmpl, style, emo,
            sampler="ddim", num_steps=4,
        )

    single = jax.jit(generate)(
        vq_params, fdm_params, key, audio8, template8, style8, emo8
    )

    mesh = make_mesh()
    bs = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    put = lambda x: jax.device_put(x, bs)
    vq_r = jax.device_put(vq_params, repl)
    fdm_r = jax.device_put(fdm_params, repl)
    sharded = jax.jit(generate)(
        vq_r, fdm_r, key, put(audio8), put(template8), put(style8), put(emo8)
    )

    np.testing.assert_allclose(
        np.asarray(single), np.asarray(sharded), atol=2e-4, rtol=1e-4
    )
    # result really is distributed over 8 devices
    assert len(sharded.sharding.device_set) == 8


def test_sequence_parallel_generate_matches_single_device():
    """Shard the FRAME axis over the mesh (sequence parallelism): the whole
    sampler scan + codec decode must compile, execute, and match the
    single-device result, with the output still sequence-sharded (proving
    XLA kept the frame axis distributed instead of gathering up front)."""
    from fdm_tpu.parallel import seq_sharding

    cfg = tiny_pipeline()
    ld, vq_params, fdm_params, motion, template, audio, style, emo = (
        init_pipeline(cfg)
    )
    key = jax.random.PRNGKey(7)

    def generate(vq_p, fdm_p, k, audio, tmpl, style, emo):
        return ld.generate(
            vq_p, fdm_p, k, audio, tmpl, style, emo,
            sampler="ddim", num_steps=4,
        )

    want = jax.jit(generate)(
        vq_params, fdm_params, key, audio, template, style, emo
    )

    mesh = make_mesh((8,), axis_names=("seq",))
    seq = seq_sharding(mesh)
    repl = replicated_sharding(mesh)
    got = jax.jit(generate)(
        jax.device_put(vq_params, repl), jax.device_put(fdm_params, repl),
        key, jax.device_put(audio, seq), jax.device_put(template, repl),
        jax.device_put(style, repl), jax.device_put(emo, repl),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4
    )
    assert len(got.sharding.device_set) == 8
    assert not got.sharding.is_fully_replicated


def test_initialize_distributed_single_process_noop():
    from fdm_tpu.parallel import initialize_distributed, local_batch_slice

    assert initialize_distributed() == 0
    # single process feeds the whole global batch (any size divides by 1;
    # the non-divisible ValueError is exercised in the two-process cluster
    # test, tests/test_multihost.py)
    assert local_batch_slice(8) == slice(0, 8)


def test_cluster_env_marker_detection(monkeypatch):
    """A failed auto-detect init must fall back silently ONLY when no
    multi-host cluster is advertised; single-chip images set
    TPU_WORKER_HOSTNAMES=localhost, which is not a cluster."""
    from fdm_tpu.parallel.mesh import _cluster_env_present

    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    assert not _cluster_env_present()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not _cluster_env_present()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    assert _cluster_env_present()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert _cluster_env_present()


def test_choose_mesh_follows_batch_divisibility(capsys):
    from fdm_tpu.cli.common import choose_mesh

    mesh = choose_mesh(8)   # 8 devices visible in tests
    assert mesh is not None and mesh.devices.size == 8
    assert choose_mesh(3) is None  # not divisible -> single-device note
    assert "not divisible" in capsys.readouterr().out
