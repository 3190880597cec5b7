"""Typed configuration for the whole framework.

Replaces the reference's five near-duplicate argparse factories
(reference models/utils/config.py:4-80, utiles/args.py, FLAME_PyTorch/config.py)
with frozen dataclasses plus three dataset presets (mead / vocaset / biwi).

Hyperparameters mirror the reference exactly where they define capability:
  * MEAD   : reference models/utils/config.py:4-20,  models/fdm_vqvae_mead.py:9-52
  * VOCASET: reference models/utils/config.py:64-77, models/fdm_vocaset.py:9-51
             (feature_dim=1024 per reference train/train_diffusion_vocaset.py:30)
  * BIWI   : reference models/utils/config.py:44-57, models/fdm.py:10-52
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class VQVAEConfig:
    """Stage-1 (E)VQ-VAE codec configuration.

    One parameterized codec covers the reference's three separate model files
    (models/vq_vae.py, vq_vae_emotion.py, vq_vae_vocaset.py).
    """

    in_dim: int = 15069                # flattened vertices per frame (V*3)
    hidden_size: int = 1024
    num_hidden_layers: int = 6
    num_attention_heads: int = 8
    intermediate_size: int = 1536
    neg_slope: float = 0.2             # LeakyReLU slope ("neg" in reference)
    quant_factor: int = 0              # temporal down/up-sampling factor
    in_affine: bool = False            # InstanceNorm affine
    face_quan_num: int = 8             # tokens per frame
    zquant_dim: int = 64               # codebook entry dim
    n_embed: int = 256                 # total codebook entries
    emotion_classes: int = 0           # 0 = plain codebook; 7 = MEAD partitioned
    commitment_beta: float = 0.25
    decoder_out_bias: bool = False     # MEAD/BIWI: bias-less final Linear
                                       # (reference vq_vae.py:329); VOCASET has
                                       # bias (vq_vae_vocaset.py:243)
    post_pre_linear: bool = True       # MEAD/BIWI project hidden<->token dims
                                       # around the codec (vq_vae.py:181,328);
                                       # VOCASET reinterprets hidden directly
                                       # as 16x64 tokens (vq_vae_vocaset.py)

    @property
    def latent_frame_dim(self) -> int:
        return self.face_quan_num * self.zquant_dim

    @property
    def codebook_partition(self) -> int:
        """Entries per emotion slice (full codebook when unpartitioned)."""
        if self.emotion_classes:
            return self.n_embed // self.emotion_classes
        return self.n_embed


@dataclasses.dataclass(frozen=True)
class FDMConfig:
    """Stage-2 denoiser (Facial Denoiser Model) configuration.

    One module covers reference models/fdm.py, fdm_vocaset.py,
    fdm_vqvae_mead.py. `feature_dim == face_quan_num * zquant_dim` so the
    latent sequence regroups to one token per animation frame.
    """

    feature_dim: int = 512
    n_head: int = 4
    num_layers: int = 8
    audio_encoder: str = "hubert-large"    # "hubert-large" | "wav2vec2-base"
    audio_dim: int = 1024                  # encoder hidden size
    audio_layers: Optional[int] = None     # truncate the named encoder to
                                           # this many transformer layers
                                           # (None = full stack); used by
                                           # matched-capacity rehearsals and
                                           # layer-truncated deployments
    audio_pair_factor: int = 2             # 50 Hz -> fps/2 frame pairing (1 = none)
    audio_interp_fps: Optional[int] = None # VOCASET: 50 Hz -> 30 fps linear interp
    tokens_per_frame: int = 8
    emotion_classes: int = 0               # MEAD: 7 (0 disables emotion head)
    style_classes: int = 25                # speaker one-hot size
    style_mish: bool = False               # BIWI wraps style embed in Mish
    latent_encoder_mish: bool = True       # BIWI uses a plain Linear
    positional_encoding: str = "sinusoidal"  # "sinusoidal" | "periodic"
    pe_period: int = 30                    # for periodic PE
    alibi_period: int = 30                 # ALiBi bucket period (BIWI: 25)
    max_seq_len: int = 600
    num_timesteps: int = 1000
    dropout: float = 0.1
    cfg_mask_prob: float = 0.1             # classifier-free-guidance cond dropout
    adain_conditioning: bool = False       # adaIN fusion of time->audio and
                                           # emotion->latent (the reference's
                                           # dormant path, fdm_vqvae_mead.py:94-95)

    @property
    def ffn_dim(self) -> int:
        return 2 * self.feature_dim


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """GaussianDiffusion (x0-parameterized DDPM) configuration.

    Mirrors reference video_diffusion_pytorch/diffusion_*_encoder_decoder.py:
    cosine beta schedule, L2 x0 loss, 1000 train timesteps.
    """

    timesteps: int = 1000
    loss_type: str = "l2"
    cosine_s: float = 0.008
    sample_steps: int = 1000        # ancestral steps at inference (MEAD: 1000)
    ddim_steps: int = 50            # DDIM steps (BIWI: 50, VOCASET: 100)
    ddim_eta: float = 0.0
    scan_unroll: int = 8            # DDPM scan unrolling: re-tuned after the
                                    # round-3 hoist/QKV-pack shrank the step
                                    # (0.01467/0.0143/0.01353/0.01342 RTF at
                                    # unroll 1/4/8/16 — 16 is within noise
                                    # of 8 but compiles longer); numerically
                                    # identical
    ddim_scan_unroll: int = 1       # DDIM measured FASTER un-unrolled on
                                    # v5e (44.7 vs 56.1 ms, 49 pairs at BIWI
                                    # full size — larger per-step program)
    cfg_scale: float = 0.0          # 0 disables classifier-free guidance;
                                    # reference demo uses 2.5 when enabled
                                    # (reference utiles/classifierfree.py:15)


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    name: str = "vocaset"
    fps: int = 30
    vertex_count: int = 5023
    audio_sr: int = 16000
    data_root: str = "data"
    # MEAD stores FLAME (expr, pose) params instead of raw vertices
    uses_flame_params: bool = False
    flame_param_dim: int = 56       # 50 expression + 6 pose
    emotion_classes: int = 0
    style_classes: int = 8

    @property
    def in_dim(self) -> int:
        return self.vertex_count * 3


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 1
    learning_rate: float = 1e-4
    weight_decay: float = 1e-2      # torch AdamW default used by reference
    # every reference stage-1 trainer passes amsgrad=True to AdamW
    # (train_mead_vqvae.py:49, train_biwi_vqvae.py:27,
    # train_vocaset_vqvae.py:27); the stage-2 trainers do not
    stage1_amsgrad: bool = True
    # "sample" (default) seeds the codebook from encoder-output tokens at
    # train start (k-means-style seeding; removes the ~1/lr-step travel
    # phase the reference's uniform(-1/N) init pays under Adam — measured
    # on the 32-clip head-to-head, quant loss stuck at ~0.17 after 3840
    # steps). "uniform" keeps the reference's init
    # (models/lib/quantizer.py:24) for training-dynamics parity studies.
    stage1_codebook_init: str = "sample"
    stage1_epochs: int = 400
    stage2_epochs: int = 100
    eval_every: int = 5
    checkpoint_every: int = 5
    # async saves snapshot the full train state on device first; with a
    # pinned dataset cache that extra copy can OOM the chip — set false to
    # stream straight to host instead (blocks training for the transfer)
    ckpt_async: bool = True
    seed: int = 0
    frame_bucket: int = 64          # pad sequence length to multiples of this
    max_frames: int = 600
    # sharding
    dp_axis: str = "data"
    mesh_shape: Tuple[int, ...] = (1,)
    # precision: "bfloat16" for speed, "float32" for parity evals
    compute_dtype: str = "float32"
    # jax_default_matmul_precision for the CLIs: "default" leaves XLA:TPU's
    # bf16-accumulating matmuls; "float32"/"highest" forces fp32-equivalent
    # (3-pass bf16) — see build_config
    matmul_precision: str = "default"
    use_pallas: bool = False
    # gradient checkpointing of FDM decoder + audio encoder layers
    # (memory <- FLOPs; enables bigger batches / longer clips per chip)
    remat: bool = False
    log_dir: str = "runs"
    checkpoint_dir: str = "checkpoints"


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Everything needed to build one dataset's two-stage pipeline."""

    dataset: DatasetConfig
    vqvae: VQVAEConfig
    fdm: FDMConfig
    diffusion: DiffusionConfig
    train: TrainConfig


def mead_config(**overrides) -> PipelineConfig:
    """3D MEAD: FLAME params, 24 fps, HuBERT-large, emotion-partitioned codebook."""
    dataset = DatasetConfig(
        name="mead", fps=24, vertex_count=5023, uses_flame_params=True,
        emotion_classes=7, style_classes=25,
    )
    vqvae = VQVAEConfig(
        in_dim=5023 * 3, face_quan_num=8, zquant_dim=64,
        n_embed=256 * 7, emotion_classes=7, decoder_out_bias=False,
    )
    fdm = FDMConfig(
        feature_dim=512, n_head=4, num_layers=8,
        audio_encoder="hubert-large", audio_dim=1024, audio_pair_factor=2,
        tokens_per_frame=8, emotion_classes=7, style_classes=25,
        positional_encoding="sinusoidal", alibi_period=30,
    )
    diffusion = DiffusionConfig(sample_steps=1000, ddim_steps=100)
    train = TrainConfig(stage1_epochs=400, stage2_epochs=100)
    return _build(dataset, vqvae, fdm, diffusion, train, overrides)


def vocaset_config(**overrides) -> PipelineConfig:
    """VOCASET: raw FLAME-mesh vertices, 30 fps, HuBERT-large, 16 tokens/frame."""
    dataset = DatasetConfig(
        name="vocaset", fps=30, vertex_count=5023, style_classes=8,
    )
    vqvae = VQVAEConfig(
        in_dim=15069, face_quan_num=16, zquant_dim=64, n_embed=256,
        decoder_out_bias=True, post_pre_linear=False,
    )
    fdm = FDMConfig(
        feature_dim=1024, n_head=8, num_layers=8,
        audio_encoder="hubert-large", audio_dim=1024, audio_pair_factor=1,
        audio_interp_fps=30, tokens_per_frame=16, emotion_classes=0,
        style_classes=8, positional_encoding="periodic", pe_period=30,
        alibi_period=30,
    )
    diffusion = DiffusionConfig(ddim_steps=100)
    train = TrainConfig(stage1_epochs=300, stage2_epochs=100, checkpoint_every=10)
    return _build(dataset, vqvae, fdm, diffusion, train, overrides)


def biwi_config(**overrides) -> PipelineConfig:
    """BIWI: 23370-vertex scans, 25 fps, wav2vec2-base, 128-dim codebook entries."""
    dataset = DatasetConfig(
        name="biwi", fps=25, vertex_count=23370, style_classes=6,
    )
    vqvae = VQVAEConfig(
        in_dim=70110, face_quan_num=8, zquant_dim=128, n_embed=256,
        decoder_out_bias=False,
    )
    fdm = FDMConfig(
        feature_dim=1024, n_head=4, num_layers=8,
        audio_encoder="wav2vec2-base", audio_dim=768, audio_pair_factor=2,
        tokens_per_frame=8, emotion_classes=0, style_classes=6,
        style_mish=True, latent_encoder_mish=False,
        positional_encoding="sinusoidal", alibi_period=25,
    )
    diffusion = DiffusionConfig(ddim_steps=50)
    train = TrainConfig(stage1_epochs=300, stage2_epochs=50)
    return _build(dataset, vqvae, fdm, diffusion, train, overrides)


_PRESETS = {
    "mead": mead_config,
    "vocaset": vocaset_config,
    "biwi": biwi_config,
}


def get_config(name: str, **overrides) -> PipelineConfig:
    try:
        return _PRESETS[name](**overrides)
    except KeyError:
        raise ValueError(
            f"unknown dataset {name!r}; expected one of {sorted(_PRESETS)}"
        ) from None


def _build(dataset, vqvae, fdm, diffusion, train, overrides) -> PipelineConfig:
    cfg = PipelineConfig(
        dataset=dataset, vqvae=vqvae, fdm=fdm, diffusion=diffusion, train=train
    )
    for key, value in overrides.items():
        section, _, field = key.partition(".")
        if not field:
            raise ValueError(
                f"override {key!r} must be dotted, e.g. 'train.batch_size'"
            )
        sub = dataclasses.replace(getattr(cfg, section), **{field: value})
        cfg = dataclasses.replace(cfg, **{section: sub})
    return cfg
