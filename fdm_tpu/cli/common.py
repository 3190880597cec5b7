"""Shared CLI plumbing: config/override parsing, dataset loading with a
synthetic fallback, audio-hidden computation, FLAME param decoding, and
parameter checkpoint IO.

The reference exposes one hand-rolled script per (dataset, task) pair with
hardcoded constants inside main() (reference train/train_mead_vqvae.py:35-65,
samples/sample_diffusion_mead.py, demo/demo_3d_mead.py:115-128). Here every
task is one CLI parameterized by --dataset with dotted --set overrides, and
every entry point runs end-to-end with --synthetic (no license-gated data or
pretrained weights needed).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fdm_tpu.configs import PipelineConfig, get_config


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persistent XLA compilation cache: repeat CLI invocations skip the
    multi-minute TPU compiles (verified working over the remote-compile
    backend). Honors JAX_COMPILATION_CACHE_DIR; defaults to ~/.cache."""
    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/fdm_tpu_xla")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the persistent cache: run uncached


def parse_override(kv: str) -> Tuple[str, object]:
    key, _, raw = kv.partition("=")
    if not raw:
        raise argparse.ArgumentTypeError(
            f"--set expects section.field=value, got {kv!r}"
        )
    for cast in (int, float):
        try:
            return key, cast(raw)
        except ValueError:
            continue
    if raw.lower() in ("true", "false"):
        return key, raw.lower() == "true"
    return key, raw


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument(
        "--dataset", choices=["mead", "vocaset", "biwi"], default="mead"
    )
    parser.add_argument(
        "--data_root", default=None,
        help="dataset directory (wav/, vertices_npy/, ... per dataset)",
    )
    parser.add_argument(
        "--synthetic", action="store_true",
        help="run on generated shape-faithful data (no dataset needed)",
    )
    parser.add_argument(
        "--synthetic_mode", choices=["noise", "correlated"], default="noise",
        help="synthetic data flavor: iid noise (plumbing checks) or "
        "'correlated' — motion is a deterministic function of a speech-like "
        "audio envelope, so training can demonstrably LEARN the "
        "audio->motion correspondence (matched vs mismatched-audio eval)",
    )
    parser.add_argument(
        "--synthetic_size", type=int, default=8, metavar="N",
        help="synthetic training clips (eval split scales as max(2, N//8)); "
        "rehearsal runs need far more than the smoke default — at 8 clips a "
        "full 300-epoch stage-1 run is only 2400 optimizer steps",
    )
    parser.add_argument(
        "--tiny", action="store_true",
        help="shrink every model to smoke-test size (implies fast compile)",
    )
    parser.add_argument(
        "--set", dest="overrides", type=parse_override, action="append",
        default=[], metavar="SECTION.FIELD=VALUE",
        help="config override, e.g. --set train.batch_size=4",
    )
    parser.add_argument("--seed", type=int, default=0)


TINY_OVERRIDES = {
    "vqvae.in_dim": 30,
    "vqvae.hidden_size": 32,
    "vqvae.num_hidden_layers": 1,
    "vqvae.num_attention_heads": 4,
    "vqvae.intermediate_size": 48,
    "vqvae.face_quan_num": 4,
    "vqvae.zquant_dim": 8,
    "fdm.feature_dim": 32,
    "fdm.n_head": 4,
    "fdm.num_layers": 1,
    "fdm.audio_dim": 12,
    "fdm.tokens_per_frame": 4,
    "fdm.num_timesteps": 20,
    "fdm.max_seq_len": 80,
    "diffusion.timesteps": 20,
    "diffusion.sample_steps": 20,
    "diffusion.ddim_steps": 4,
    "train.frame_bucket": 8,
    "train.max_frames": 80,
    "dataset.vertex_count": 10,
}


def build_config(args) -> PipelineConfig:
    overrides = {}
    if args.tiny:
        overrides.update(TINY_OVERRIDES)
        # n_embed must stay divisible by the emotion partition
        emo = 7 if args.dataset == "mead" else 0
        overrides["vqvae.n_embed"] = 8 * emo if emo else 16
        if args.dataset == "mead":
            # tiny FLAME-less MEAD still carries params->vertices shape 30
            overrides["dataset.flame_param_dim"] = 14  # 8 expr + 6 pose
    if getattr(args, "data_root", None):
        overrides["dataset.data_root"] = args.data_root
    for key, value in args.overrides:
        overrides[key] = value
    cfg = get_config(args.dataset, **overrides)
    if cfg.train.matmul_precision != "default":
        # XLA:TPU matmuls/einsums accumulate in bf16 by default; "float32"
        # runs them as 3-pass bf16 (fp32-equivalent) — needed when signals
        # sit near bf16's relative noise floor (facial displacements are
        # ~3e-3) or for torch-parity studies
        jax.config.update(
            "jax_default_matmul_precision", cfg.train.matmul_precision
        )
    return cfg


def make_pipeline(cfg: PipelineConfig, with_audio_encoder: bool = False,
                  allow_tiny_audio_encoder: bool = False,
                  for_training: bool = False):
    """LatentDiffusion honoring cfg.train.compute_dtype (bf16 for speed,
    fp32 for parity evals — SURVEY.md §7.3 float-semantics note) and
    cfg.train.use_pallas (fused-attention denoiser).

    for_training forces the bias-table attention even under use_pallas: the
    fused Pallas kernel never materializes the softmax weights, so the
    training-time attention-weight dropout (fdm.dropout > 0) cannot run
    through it — without this, the first train step would raise mid-epoch."""
    from fdm_tpu.models import LatentDiffusion

    dtype = (
        jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    )
    fused = cfg.train.use_pallas
    if fused and for_training and cfg.fdm.dropout > 0:
        print(
            "note: train.use_pallas requested but fdm.dropout > 0 needs the "
            "softmax weights — training uses the bias-table attention "
            "(fused stays available for sampling)"
        )
        fused = False
    return LatentDiffusion.create(
        cfg, dtype=dtype,
        self_attn_mode="fused" if fused else "table",
        with_audio_encoder=with_audio_encoder,
        allow_tiny_audio_encoder=allow_tiny_audio_encoder,
        remat=cfg.train.remat,
    )


def load_splits(cfg: PipelineConfig, args, read_audio: bool = True):
    if args.synthetic:
        from fdm_tpu.data import synthetic_splits

        n_train = getattr(args, "synthetic_size", 8)
        return synthetic_splits(
            cfg,
            num_train=n_train,
            num_eval=max(2, n_train // 8),
            min_frames=16 if args.tiny else 40,
            max_frames=32 if args.tiny else 120,
            seed=args.seed,
            with_audio=read_audio,
            mode=getattr(args, "synthetic_mode", "noise"),
        )
    from fdm_tpu.data import load_biwi, load_mead, load_vocaset

    loaders = {"mead": load_mead, "vocaset": load_vocaset, "biwi": load_biwi}
    return loaders[cfg.dataset.name](
        cfg.dataset.data_root, read_audio=read_audio
    )


# ---------------- FLAME param decoding (MEAD) ----------------


class FlameDecoder:
    """Decodes (B, T, param_dim) FLAME params to (B, T, V*3) vertices on
    device — the reference's torch2mesh per batch
    (reference train/train_mead_vqvae.py:86-88) without the chunk-of-8
    serialization. With --synthetic/--tiny a synthetic FLAME model stands in
    for the licensed generic_model.pkl."""

    def __init__(self, cfg: PipelineConfig, flame_path: Optional[str] = None,
                 device=None):
        """`device` pins the decode (weights + execution) to a specific
        backend — pass `jax.devices('cpu')[0]` for host-side eval paths:
        on a remote-attached accelerator, a decoder built on the default
        device re-downloads ~30 MB of model tensors per call when the
        caller wants host results (measured 1.9 s/decode over the tunnel
        vs milliseconds on the host CPU)."""
        from fdm_tpu.geometry import (
            load_flame_model,
            params_to_vertices,
            synthetic_flame_model,
        )

        n_pose = 6
        self.n_expr = cfg.dataset.flame_param_dim - n_pose
        if flame_path:
            self.model = load_flame_model(flame_path)
        else:
            # full 300+100 beta basis so flame_forward's padding lines up
            self.model = synthetic_flame_model(
                num_vertices=cfg.dataset.vertex_count
            )

        # model tensors enter as jit args (closure capture would embed the
        # ~24 MB shapedirs as HLO constants; see bench.py note)
        n_expr = self.n_expr
        base = self.model
        self._device = device

        @jax.jit
        def decode(weights, params):  # (B, T, P) -> (B, T, V*3)
            model = base._replace(**weights)
            return jax.vmap(
                lambda p: params_to_vertices(model, p, n_expr=n_expr)
            )(params)

        self._weights = {
            k: getattr(base, k)
            for k in ("v_template", "shapedirs", "posedirs", "j_regressor",
                      "lbs_weights")
        }
        if device is not None:
            self._weights = jax.device_put(self._weights, device)

        def _call(params):
            if self._device is not None:
                with jax.default_device(self._device):
                    return decode(self._weights, params)
            return decode(self._weights, params)

        self._decode = _call
        self._template_cache = {}

    def __call__(self, params: jnp.ndarray) -> jnp.ndarray:
        return self._decode(params)

    def template(self, batch: int, param_dim: int) -> jnp.ndarray:
        """MEAD template = zero-param FLAME mesh (reference
        metric/metric.py:84, data loader template=zeros). Cached per
        (batch, param_dim): the result is constant, and recomputing it
        dispatched an extra remote program per training batch."""
        key = (batch, param_dim)
        cached = self._template_cache.get(key)
        if cached is None:
            cached = self._decode(jnp.zeros((batch, 1, param_dim)))
            self._template_cache[key] = cached
        return cached


def decode_motion(cfg: PipelineConfig, batch: dict,
                  flame: Optional[FlameDecoder]) -> dict:
    """If the dataset stores FLAME params, decode motion+template to vertex
    space; otherwise pass through.

    The decoded vertices STAY on device: a np.asarray here used to download
    (B, T, 15069) floats to the host only for the train step to re-upload
    them — a ~8 MB/step (batch 1) round trip over a ~40 MB/s link that
    dominated CLI training throughput. Host consumers (np.save, metrics)
    convert implicitly where they actually need host data."""
    if flame is None:
        return batch
    out = dict(batch)
    out["motion"] = flame(jnp.asarray(batch["motion"]))
    # the cached zero-param template is only equivalent if the loader's
    # template params really are all zero (true for mead.py and the
    # synthetic records); this is still host numpy, so the check is cheap
    tmpl = batch["template"]
    if isinstance(tmpl, np.ndarray) and tmpl.any():
        raise ValueError(
            "FLAME-param dataset supplied non-zero template params; the "
            "cached zero-param template decode does not cover this — "
            "decode per-subject templates instead"
        )
    out["template"] = flame.template(tmpl.shape[0], tmpl.shape[-1])
    return out


# ---------------- audio hidden states ----------------


class AudioFrontend:
    """waveform -> frame-aligned hidden states (B, T, audio_dim*pair) for the
    FDM. Uses the JAX HuBERT/wav2vec2 encoder when full-size (weights loadable
    via --audio_params, else randomly initialized); --tiny builds a 2-layer
    encoder with matching hidden size so smoke tests stay fast."""

    def __init__(self, cfg: PipelineConfig, params_path: Optional[str] = None,
                 seed: int = 0, allow_tiny: bool = False):
        from fdm_tpu.audio import AudioEncoder
        from fdm_tpu.audio.encoder import encoder_config_for

        enc_cfg = encoder_config_for(cfg.fdm, allow_tiny=allow_tiny)
        self.cfg = cfg
        self.encoder = AudioEncoder(enc_cfg)
        if params_path:
            from fdm_tpu.utils.serialization import fill_missing, load_params

            # artifacts saved before a param existed (e.g. masked_spec_embed
            # predates SpecAugment support) get the missing leaves from a
            # fresh init instead of crashing at apply time
            template = jax.jit(self.encoder.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, 3200))
            )
            self.params = fill_missing(
                load_params(params_path), template, label="audio params"
            )
        else:
            # jitted: un-jitted flax init dispatches op-by-op (minutes on
            # remote-compile backends, CLAUDE.md rule 3)
            self.params = jax.jit(self.encoder.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, 3200))
            )
        self._encode = jax.jit(
            lambda p, wav: self.encoder.apply(p, wav, even_trim=False)
        )

    def __call__(self, audio: np.ndarray, num_frames: int) -> jnp.ndarray:
        """audio: (B, S) float32 16 kHz -> (B, num_frames, audio_dim*pair)."""
        from fdm_tpu.audio.features import align_hidden_frames

        hidden = self._encode(self.params, jnp.asarray(audio))
        return align_hidden_frames(hidden, self.cfg.fdm, num_frames)


# ---------------- shared inference-surface helpers ----------------
# one home for logic the demo CLI and the serving front end must agree on
# (a copy in each silently diverges — round-3 review finding)


def default_sampler(cfg: PipelineConfig) -> str:
    """Reference defaults: MEAD samples with the full 1000-step ancestral
    DDPM (diffusion_mead_encoder_decoder.py:663), BIWI/VOCASET with DDIM
    (samples/sample_diffusion_{biwi,vocaset}.py:72,80)."""
    return "ddpm" if cfg.dataset.name == "mead" else "ddim"


# the TRAINING label set and order (data/mead.py EMOTIONS; reference
# data_loader_mead.py:44) plus 'neutral', which encodes as the all-zeros
# vector — a surface-local ordering would silently condition on the wrong
# class (round-3 demo bug)
def emotion_labels() -> tuple:
    from fdm_tpu.data.mead import EMOTIONS

    return tuple(EMOTIONS) + ("neutral",)


def encode_emotion_row(cfg: PipelineConfig, name: str) -> "np.ndarray":
    """One (emotion_classes,) one-hot row for a label name; raises
    ValueError for unknown labels (validate BEFORE batching — a bad label
    inside a batched device call would fail every co-batched request)."""
    from fdm_tpu.data.mead import EMOTIONS as _TRAIN, emotion_one_hot

    labels = emotion_labels()
    if name not in labels:
        raise ValueError(
            f"unknown emotion {name!r}; expected one of {labels}"
        )
    if cfg.fdm.emotion_classes == len(_TRAIN):
        return np.asarray(emotion_one_hot(name), np.float32)
    # tiny/smoke configs shrink the class count; any stable index
    idx = labels.index(name) % cfg.fdm.emotion_classes
    return np.eye(cfg.fdm.emotion_classes, dtype=np.float32)[idx]


def resolve_template(cfg: PipelineConfig,
                     template_file: Optional[str] = None,
                     flame_model: Optional[str] = None) -> "np.ndarray":
    """(1, 1, in_dim) vertex template: explicit file > FLAME zero-param
    mesh (MEAD) > zeros (reference demo_3d_mead.py:96-98 loads
    FLAME_template.npy; zeros matches the synthetic path)."""
    if template_file:
        return np.load(template_file).reshape(1, 1, -1).astype(np.float32)
    if cfg.dataset.uses_flame_params:
        flame = FlameDecoder(cfg, flame_model)
        return np.asarray(
            flame.template(1, cfg.dataset.flame_param_dim)
        ).astype(np.float32)
    return np.zeros((1, 1, cfg.vqvae.in_dim), np.float32)


# ---------------- parameter IO ----------------


def save_params(path: str, params) -> None:
    from fdm_tpu.utils.serialization import save_params as _save

    _save(path, params)


def load_params(path: str):
    from fdm_tpu.utils.serialization import load_params as _load

    return _load(path)


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def save_progress(out_dir: str, epoch: int, step: int) -> None:
    """Record the last completed epoch (atomically) so --resume can map the
    restored global step back to an epoch number. Orbax checkpoints carry
    only the step; epoch counts per epoch vary with bucketed batching, so
    the mapping is recorded rather than derived."""
    import json

    tmp = os.path.join(out_dir, "progress.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"epoch": int(epoch), "step": int(step)}, f)
    os.replace(tmp, os.path.join(out_dir, "progress.json"))


def resume_start_epoch(out_dir: str, restored_step: int) -> int:
    """Epoch count already completed at ``restored_step``.

    With --resume, --epochs is the TOTAL budget (the run continues toward
    it), not "N more": the loop starts at this value + 1. Exact when the
    restored checkpoint coincides with the last recorded epoch; for an
    older checkpoint the epoch is interpolated from the recorded
    steps-per-epoch average (exact for constant-size epochs). Returns 0
    (old behavior: run the full budget) when no progress file exists."""
    import json

    path = os.path.join(out_dir, "progress.json")
    if restored_step <= 0 or not os.path.exists(path):
        return 0
    with open(path) as f:
        prog = json.load(f)
    if prog.get("epoch", 0) <= 0 or prog.get("step", 0) <= 0:
        return 0
    if restored_step >= prog["step"]:
        return int(prog["epoch"])
    per_epoch = prog["step"] / prog["epoch"]
    return max(0, int(round(restored_step / per_epoch)))


def choose_mesh(batch_size: int):
    """Data-parallel mesh over all visible devices when the global batch
    divides evenly; otherwise single-device (the reference is always
    single-device at batch 1, SURVEY.md §2.5)."""
    n_dev = jax.device_count()
    if n_dev > 1 and batch_size % n_dev == 0:
        from fdm_tpu.parallel import make_mesh

        return make_mesh((n_dev,))
    if n_dev > 1:
        print(f"note: batch_size={batch_size} not divisible by "
              f"{n_dev} devices; running single-device")
    return None
