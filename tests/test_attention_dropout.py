"""Attention-WEIGHT dropout parity vs torch.

The reference trains through torch nn.TransformerDecoderLayer(dropout=0.1)
(reference models/fdm_vqvae_mead.py:46-47), and torch MultiheadAttention
applies that dropout to the post-softmax attention probabilities in addition
to the three output-path dropouts. These tests pin our implementation to
torch's training-mode statistics:

  * TorchMHA: empirical per-element mean/std over many rng draws vs a torch
    nn.MultiheadAttention with identical (converted) weights in train mode;
  * AlignedCrossAttention (the diagonal fast path, which never materializes
    softmax weights): its singleton-weight Bernoulli + 1/(1-p) rescale must
    be distributionally identical to torch's element dropout of the
    diagonal-masked probability matrix;
  * the Pallas fused path refuses weight dropout (inference-only kernel);
  * the stage-2 training loss actually exercises the weight dropout (key
    sensitivity at p>0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn_t

from fdm_tpu.models.fdm import FDM, AlignedCrossAttention, TorchMHA

D, H, B, T = 16, 4, 2, 6
P_DROP = 0.25  # large p -> strong statistical signal at moderate draw count
N_DRAWS = 400


def _torch_mha(dropout):
    torch.manual_seed(0)
    return nn_t.MultiheadAttention(D, H, dropout=dropout, batch_first=True)


def _params_from_torch(mha):
    wq, wk, wv = mha.in_proj_weight.detach().chunk(3, dim=0)
    bq, bk, bv = mha.in_proj_bias.detach().chunk(3, dim=0)
    dense = lambda w, b: {
        "kernel": jnp.asarray(w.numpy().T), "bias": jnp.asarray(b.numpy())
    }
    return {"params": {
        "q": dense(wq, bq), "k": dense(wk, bk), "v": dense(wv, bv),
        "out": dense(
            mha.out_proj.weight.detach(), mha.out_proj.bias.detach()
        ),
    }}


def _empirical(apply_one, n=N_DRAWS):
    outs = np.stack([apply_one(i) for i in range(n)])
    return outs.mean(axis=0), outs.std(axis=0)


def test_mha_weight_dropout_statistics_vs_torch():
    mha = _torch_mha(P_DROP).train()
    params = _params_from_torch(mha)
    ours = TorchMHA(D, H, dropout=P_DROP)

    torch.manual_seed(1)
    x = torch.randn(B, T, D)
    mem = torch.randn(B, T, D)
    xj, memj = jnp.asarray(x.numpy()), jnp.asarray(mem.numpy())

    # eval mode must agree exactly (dropout off)
    mha.eval()
    with torch.no_grad():
        ref_eval = mha(x, mem, mem, need_weights=False)[0].numpy()
    ours_eval = ours.apply(params, xj, memj)
    np.testing.assert_allclose(np.asarray(ours_eval), ref_eval,
                               rtol=1e-4, atol=1e-5)

    # train mode: compare empirical mean and std over rng draws
    mha.train()
    fwd = jax.jit(lambda k: ours.apply(
        params, xj, memj, deterministic=False, rngs={"dropout": k}
    ))

    def ours_draw(i):
        return np.asarray(fwd(jax.random.PRNGKey(i)))

    def torch_draw(i):
        torch.manual_seed(10_000 + i)
        with torch.no_grad():
            return mha(x, mem, mem, need_weights=False)[0].numpy()

    mean_o, std_o = _empirical(ours_draw)
    mean_t, std_t = _empirical(torch_draw)

    # dropout is unbiased: E[out] = eval out; SEM-scaled elementwise check
    sem = (np.maximum(std_o, std_t) / np.sqrt(N_DRAWS)).max()
    np.testing.assert_allclose(mean_o, mean_t, atol=6 * sem + 1e-6)
    np.testing.assert_allclose(mean_o, ref_eval, atol=6 * sem + 1e-6)
    # the noise scale itself must match (both implement the same Bernoulli)
    assert np.allclose(std_o.mean(), std_t.mean(), rtol=0.10), (
        std_o.mean(), std_t.mean()
    )


def test_aligned_cross_attention_dropout_vs_torch_diagonal():
    """Fast-path singleton-weight dropout == torch element dropout of the
    diagonal-masked probability matrix (same converted weights)."""
    mha = _torch_mha(P_DROP)
    params = _params_from_torch(mha)
    ours = AlignedCrossAttention(D, H, dropout=P_DROP)

    torch.manual_seed(2)
    x = torch.randn(B, T, D)
    mem = torch.randn(B, T, D)
    xj, memj = jnp.asarray(x.numpy()), jnp.asarray(mem.numpy())
    # diagonal-only attention: -inf off the diagonal
    attn_mask = torch.full((T, T), float("-inf"))
    attn_mask.fill_diagonal_(0.0)

    mha.eval()
    with torch.no_grad():
        ref_eval = mha(
            x, mem, mem, attn_mask=attn_mask, need_weights=False
        )[0].numpy()
    ours_eval = ours.apply(params, xj, memj)
    np.testing.assert_allclose(np.asarray(ours_eval), ref_eval,
                               rtol=1e-4, atol=1e-5)

    mha.train()
    fwd = jax.jit(lambda k: ours.apply(
        params, xj, memj, deterministic=False, rngs={"dropout": k}
    ))

    def ours_draw(i):
        return np.asarray(fwd(jax.random.PRNGKey(i)))

    def torch_draw(i):
        torch.manual_seed(20_000 + i)
        with torch.no_grad():
            return mha(
                x, mem, mem, attn_mask=attn_mask, need_weights=False
            )[0].numpy()

    mean_o, std_o = _empirical(ours_draw)
    mean_t, std_t = _empirical(torch_draw)
    sem = (np.maximum(std_o, std_t) / np.sqrt(N_DRAWS)).max()
    np.testing.assert_allclose(mean_o, mean_t, atol=6 * sem + 1e-6)
    assert np.allclose(std_o.mean(), std_t.mean(), rtol=0.10), (
        std_o.mean(), std_t.mean()
    )


def test_fused_mode_rejects_weight_dropout():
    ours = TorchMHA(D, H, dropout=0.1)
    x = jnp.zeros((1, 8, D))
    params = {"params": {
        name: {"kernel": jnp.zeros((D, D)), "bias": jnp.zeros((D,))}
        for name in ("q", "k", "v", "out")
    }}
    try:
        ours.apply(params, x, x, fused_alibi_period=25,
                   deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
        raised = False
    except ValueError as e:
        raised = "inference path" in str(e)
    assert raised


def test_denoise_training_mode_uses_attention_dropout():
    """With p>0, training-mode denoise output depends on the dropout key and
    differs from the deterministic output — proving the weight dropout is
    live on the training path the stage-2 loss uses (deterministic=False,
    rngs={'dropout': ...} in fdm_tpu/models/pipeline.py)."""
    from fdm_tpu.configs import FDMConfig

    cfg = FDMConfig(
        feature_dim=32, n_head=4, num_layers=1, audio_dim=24,
        audio_pair_factor=2, tokens_per_frame=4, emotion_classes=7,
        style_classes=5, num_timesteps=50, max_seq_len=40, alibi_period=30,
        dropout=0.3,
    )
    model = FDM(cfg)
    Bb, Tt = 1, 5
    L, C = Tt * cfg.tokens_per_frame, cfg.feature_dim // cfg.tokens_per_frame
    x_t = jax.random.normal(jax.random.PRNGKey(0), (Bb, L, C))
    audio = jax.random.normal(
        jax.random.PRNGKey(1), (Bb, Tt, cfg.audio_dim * cfg.audio_pair_factor)
    )
    style = jnp.eye(5)[:Bb]
    emo = jnp.eye(7)[:Bb]
    t = jnp.array([3], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(2), x_t, t, audio, style, emo)
    # zero-init head would hide the dropout; perturb every leaf with noise
    # so the output carries real signal from every sublayer
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.3 * rng.standard_normal(p.shape).astype(np.float32),
        params,
    )

    def train_out(seed):
        return model.apply(
            params, x_t, t, audio, style, emo, False,
            rngs={"dropout": jax.random.PRNGKey(seed)},
        )

    det = model.apply(params, x_t, t, audio, style, emo)
    a, b = train_out(1), train_out(2)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(det))
    # same key -> bit-identical (reproducible training step)
    np.testing.assert_array_equal(np.asarray(train_out(1)),
                                  np.asarray(train_out(1)))
