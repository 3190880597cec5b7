"""LG-LDM pipeline: frozen (E)VQ-VAE codec + FDM denoiser + DDPM/DDIM sampling.

Capability parity with the reference's stage-2 composition
(train/train_diffusion_mead.py:25-105, samples/sample_diffusion_*.py,
demo/demo_3d_mead.py:77-112) as pure jittable functions:

  stage2_train_loss : latent x0-loss + end-to-end vertex reconstruction loss
                      through the frozen quantize+decode
  generate          : audio features -> latents (scan sampler, CFG folded into
                      one doubled-batch forward) -> quantize -> decode ->
                      vertices; the whole chain is one XLA program, nothing
                      leaves the device.

Classifier-free guidance mirrors reference utiles/classifierfree.py:8-21
(out_uncond + scale * (out_cond - out_uncond)) with the unconditional branch
zeroing the one-hots like FDM.mask_cond(force_mask=True)
(reference fdm_vqvae_mead.py:54-58).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fdm_tpu.configs import PipelineConfig
from fdm_tpu.codec import VQAutoEncoder
from fdm_tpu.diffusion import (
    DiffusionSchedule,
    ddim_sample,
    ddpm_sample,
    make_schedule,
    p_losses,
)
from fdm_tpu.models.fdm import FDM
from fdm_tpu.ops import hw_dropout_key, masked_mean


@dataclasses.dataclass(frozen=True)
class LatentDiffusion:
    """Stateless bundle of modules + schedule. Parameters travel separately
    (vq_params, fdm_params[, audio params]) so the train step can
    donate/freeze them independently."""

    config: PipelineConfig
    schedule: DiffusionSchedule
    vqvae: VQAutoEncoder
    fdm: FDM
    audio_encoder: object = None   # fdm_tpu.audio.AudioEncoder, optional

    @classmethod
    def create(cls, config: PipelineConfig, dtype=jnp.float32,
               cross_mode: str = "fast",
               self_attn_mode: str = "table",
               with_audio_encoder: bool = False,
               allow_tiny_audio_encoder: bool = False,
               remat: bool = False) -> "LatentDiffusion":
        if config.fdm.num_timesteps != config.diffusion.timesteps:
            # a drift here is SILENT downstream: the FDM's timestep one-hot
            # emits all-zero rows for t >= fdm.num_timesteps, so denoise
            # steps lose their time conditioning with no error
            raise ValueError(
                f"fdm.num_timesteps ({config.fdm.num_timesteps}) must equal "
                f"diffusion.timesteps ({config.diffusion.timesteps}); "
                "override both together (--set diffusion.timesteps=N --set "
                "fdm.num_timesteps=N)"
            )
        audio_encoder = None
        if with_audio_encoder:
            from fdm_tpu.audio import AudioEncoder
            from fdm_tpu.audio.encoder import encoder_config_for

            audio_encoder = AudioEncoder(
                encoder_config_for(
                    config.fdm, allow_tiny=allow_tiny_audio_encoder
                ),
                dtype=dtype,
                remat=remat,
            )
        return cls(
            config=config,
            schedule=make_schedule(
                config.diffusion.timesteps, config.diffusion.cosine_s
            ),
            vqvae=VQAutoEncoder(config.vqvae, dtype=dtype),
            fdm=FDM(config.fdm, dtype=dtype, cross_mode=cross_mode,
                    self_attn_mode=self_attn_mode, remat=remat),
            audio_encoder=audio_encoder,
        )

    def encode_audio(self, audio_params, wav: jnp.ndarray,
                     num_frames: int,
                     specaugment_key: Optional[jax.Array] = None,
                     freeze_extractor: bool = False,
                     ) -> jnp.ndarray:
        """Raw waveform (B, S) -> frame-aligned hidden states
        (B, num_frames, audio_dim*pair) through the in-pipeline encoder —
        jittable, so it can live INSIDE the train step when the encoder is
        trained jointly (reference quirk Q10: stage 2 fine-tunes the
        HuBERT/wav2vec2 transformer; only the conv extractor is frozen,
        reference models/fdm_vqvae_mead.py:19). `specaugment_key` enables
        training-time SpecAugment masking (reference models/hubert.py:112)."""
        from fdm_tpu.audio.features import align_hidden_frames

        if self.audio_encoder is None:
            raise ValueError("pipeline built without with_audio_encoder=True")
        hidden = self.audio_encoder.apply(
            audio_params, wav, even_trim=False,
            specaugment_key=specaugment_key,
            freeze_extractor=freeze_extractor,
        )
        return align_hidden_frames(hidden, self.config.fdm, num_frames)

    def _token_mask(self, frame_mask):
        """(B, T) frame mask -> (B, latent_T * face_quan_num) token mask at
        the quantizer's rate (latent_T < T when quant_factor > 0)."""
        if frame_mask is None:
            return None
        from fdm_tpu.codec import downsample_frame_mask

        latent = downsample_frame_mask(
            frame_mask, self.config.vqvae.quant_factor
        )
        return jnp.repeat(latent, self.config.vqvae.face_quan_num, axis=1)

    # ---------------- stage 1 training ----------------

    def stage1_train_loss(
        self,
        vq_params,
        motion: jnp.ndarray,           # (B, T, in_dim)
        template: jnp.ndarray,         # (B, 1, in_dim)
        emotion_one_hot: Optional[jnp.ndarray] = None,
        frame_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, dict]:
        """VQ-VAE objective: masked L1 reconstruction + commitment/codebook
        loss (reference train/train_mead_vqvae.py:136-141)."""
        token_mask = self._token_mask(frame_mask)
        recon, quant_loss, perplexity = self.vqvae.apply(
            vq_params, motion, template, emotion_one_hot, token_mask,
            frame_mask,
        )
        err = jnp.abs(recon - motion)
        recon_loss = masked_mean(err, frame_mask)
        total = recon_loss + quant_loss
        return total, {
            "recon_loss": recon_loss,
            "quant_loss": quant_loss,
            "perplexity": perplexity,
            "loss": total,
        }

    # ---------------- stage 2 training ----------------

    def stage2_train_loss(
        self,
        vq_params,
        fdm_params,
        key: jax.Array,
        motion: jnp.ndarray,          # (B, T, in_dim) vertex displacements+template
        template: jnp.ndarray,        # (B, 1, in_dim)
        audio_hidden: jnp.ndarray,    # (B, T, audio_dim*pair) frame-aligned
        style_one_hot: jnp.ndarray,
        emotion_one_hot: Optional[jnp.ndarray] = None,
        frame_mask: Optional[jnp.ndarray] = None,  # (B, T) 1=real frame
    ) -> Tuple[jnp.ndarray, dict]:
        """Denoise loss + frozen-codec vertex reconstruction loss
        (reference train/train_diffusion_mead.py:87-103)."""
        cfg = self.config
        B = motion.shape[0]
        t_key, noise_key, cfg_key, drop_key = jax.random.split(key, 4)

        # stage 1 is frozen: no gradient reaches the codec parameters, but
        # gradients still flow through the decode activations to the FDM
        # (the reference freezes by excluding the VQ from the optimizer,
        # train/train_diffusion_mead.py:32)
        vq_params = jax.lax.stop_gradient(vq_params)
        latent = self.vqvae.apply(
            vq_params, motion - template, emotion_one_hot, frame_mask,
            method="encode",
        )

        t = jax.random.randint(
            t_key, (B,), 0, self.schedule.num_timesteps, dtype=jnp.int32
        )
        noise = jax.random.normal(noise_key, latent.shape, dtype=latent.dtype)

        # classifier-free-guidance conditioning dropout (Bernoulli 0.1 — the
        # reference defines mask_cond but never wires it into forward,
        # fdm_vqvae_mead.py:54-62; we implement the evident intent)
        if cfg.fdm.cfg_mask_prob > 0:
            drop = jax.random.bernoulli(
                cfg_key, cfg.fdm.cfg_mask_prob, (B, 1)
            ).astype(style_one_hot.dtype)
            style_in = style_one_hot * (1.0 - drop)
            emo_in = (
                emotion_one_hot * (1.0 - drop)
                if emotion_one_hot is not None else None
            )
        else:
            style_in, emo_in = style_one_hot, emotion_one_hot

        audio_feat = self.fdm.apply(
            fdm_params, audio_hidden, method="prepare_audio"
        )

        # hardware-RNG bits for the decoder dropout masks (ops.hw_dropout_key)
        fdm_drop_key = hw_dropout_key(drop_key)

        def denoise_fn(x_t, t_in):
            # deterministic=False activates the decoder-layer dropout
            # (reference nn.TransformerDecoderLayer trains with dropout=0.1)
            return self.fdm.apply(
                fdm_params, x_t, t_in, audio_feat, style_in, emo_in,
                False, method="denoise", rngs={"dropout": fdm_drop_key},
            )

        token_mask = self._token_mask(frame_mask)
        denoise_loss, x_recon = p_losses(
            self.schedule, denoise_fn, latent, t, noise,
            loss_type=cfg.diffusion.loss_type, mask=token_mask,
        )

        # end-to-end vertex reconstruction through the frozen codec
        q = self.vqvae.apply(
            vq_params, x_recon, emotion_one_hot, token_mask,
            method="quant",
        )
        recon_motion = self.vqvae.apply(
            vq_params, q.z_q, frame_mask, method="decode"
        )
        recon_motion = recon_motion + template
        err = jnp.square(recon_motion - motion)
        recon_loss = masked_mean(err, frame_mask)

        total = denoise_loss + recon_loss
        return total, {
            "denoise_loss": denoise_loss,
            "recon_loss": recon_loss,
            "loss": total,
        }

    def stage2_train_loss_e2e(
        self,
        vq_params,
        params,                        # {"fdm": ..., "audio": ...}
        key: jax.Array,
        motion: jnp.ndarray,           # (B, T, in_dim)
        template: jnp.ndarray,
        audio_wav: jnp.ndarray,        # (B, S) raw 16 kHz waveform
        style_one_hot: jnp.ndarray,
        emotion_one_hot: Optional[jnp.ndarray] = None,
        frame_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, dict]:
        """Stage-2 loss with the audio encoder INSIDE the step so its
        transformer trains jointly with the FDM — the reference's actual
        stage-2 regime (quirk Q10; reference train/train_diffusion_mead.py
        optimizes diffusion.parameters() which includes HuBERT). Freeze the
        conv extractor by masking its optimizer updates
        (fdm_tpu.train.freeze_audio_conv_mask). SpecAugment time-masking is
        applied like the reference's `self.training` branch
        (models/hubert.py:112-122)."""
        T = motion.shape[1]
        sa_key, key = jax.random.split(key)
        # freeze_extractor: the conv extractor is frozen in this regime
        # (reference models/fdm_vqvae_mead.py:19) — stopping gradients at
        # the feature boundary skips its whole backward pass instead of
        # computing grads the masked optimizer would zero anyway
        audio_hidden = self.encode_audio(
            params["audio"], audio_wav, T, specaugment_key=sa_key,
            freeze_extractor=True,
        )
        return self.stage2_train_loss(
            vq_params, params["fdm"], key, motion, template, audio_hidden,
            style_one_hot, emotion_one_hot, frame_mask,
        )

    # ---------------- inference ----------------

    def make_denoise_fn(
        self,
        fdm_params,
        audio_feat: jnp.ndarray,
        style_one_hot: jnp.ndarray,
        emotion_one_hot: Optional[jnp.ndarray],
        cfg_scale: float = 0.0,
        hoist_cross: bool = True,
    ):
        """Build the x0-denoiser closure for the samplers. cfg_scale > 0
        folds conditional+unconditional into one doubled-batch forward.

        hoist_cross precomputes the step-invariant audio term of the
        diagonal cross attention once per clip (FDM.prepare_cross) so the
        sampling scan stops re-evaluating two GEMMs per layer per step —
        available whenever the fast cross path is in use (auto-disabled for
        cross_mode='full' and adain conditioning)."""
        hoist = (
            hoist_cross
            and self.fdm.cross_mode == "fast"
            and not self.config.fdm.adain_conditioning
        )

        def _cross(audio):
            if not hoist:
                return None
            return self.fdm.apply(fdm_params, audio, method="prepare_cross")

        # the BRANCH is static (None / non-positive python float => no CFG)
        # but the scale VALUE may be a traced scalar — serving passes it as
        # a jit argument so client-chosen guidance strengths don't each
        # trigger a full sampler recompile
        cfg_off = cfg_scale is None or (
            isinstance(cfg_scale, (int, float)) and cfg_scale <= 0.0
        )
        if not cfg_off:
            style2 = jnp.concatenate(
                [style_one_hot, jnp.zeros_like(style_one_hot)], axis=0
            )
            emo2 = (
                jnp.concatenate(
                    [emotion_one_hot, jnp.zeros_like(emotion_one_hot)], axis=0
                )
                if emotion_one_hot is not None else None
            )
            audio2 = jnp.concatenate([audio_feat, audio_feat], axis=0)
            cross2 = _cross(audio2)

            def denoise_fn(x_t, t):
                x2 = jnp.concatenate([x_t, x_t], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                out = self.fdm.apply(
                    fdm_params, x2, t2, audio2, style2, emo2, True, cross2,
                    method="denoise",
                )
                cond, uncond = jnp.split(out, 2, axis=0)
                return uncond + cfg_scale * (cond - uncond)

            return denoise_fn

        cross = _cross(audio_feat)

        def denoise_fn(x_t, t):
            return self.fdm.apply(
                fdm_params, x_t, t, audio_feat, style_one_hot,
                emotion_one_hot, True, cross, method="denoise",
            )

        return denoise_fn

    def generate(
        self,
        vq_params,
        fdm_params,
        key: jax.Array,
        audio_hidden: jnp.ndarray,     # (B, T, audio_dim*pair)
        template: jnp.ndarray,         # (B, 1, in_dim)
        style_one_hot: jnp.ndarray,
        emotion_one_hot: Optional[jnp.ndarray] = None,
        sampler: str = "ddpm",
        num_steps: Optional[int] = None,
        cfg_scale: Optional[float] = None,
    ) -> jnp.ndarray:
        """Audio features -> vertex animation (B, T, in_dim). One XLA program."""
        cfg = self.config
        B, T = audio_hidden.shape[:2]
        if cfg.vqvae.quant_factor > 0:
            # latent_shape below assumes one latent frame per audio frame;
            # with temporal downsampling the decoder would upsample by
            # 2^quant_factor and silently return an animation that many
            # times longer than the audio (training crashes loudly via the
            # denoise_embed frame check; make inference loud too)
            raise NotImplementedError(
                "generate() supports quant_factor == 0 only (every shipped "
                "preset); a quant_factor > 0 codec changes the latent frame "
                "rate and needs an audio/latent alignment policy"
            )
        latent_shape = (
            B, T * cfg.vqvae.face_quan_num, cfg.vqvae.zquant_dim
        )
        cfg_scale = (
            cfg.diffusion.cfg_scale if cfg_scale is None else cfg_scale
        )

        audio_feat = self.fdm.apply(
            fdm_params, audio_hidden, method="prepare_audio"
        )
        denoise_fn = self.make_denoise_fn(
            fdm_params, audio_feat, style_one_hot, emotion_one_hot, cfg_scale
        )

        if sampler == "ddpm":
            steps = num_steps or cfg.diffusion.sample_steps
            # unrolling trims per-iteration scan overhead, which only
            # matters when the step program is small: B=1 measured
            # 0.0147/0.0135 RTF at unroll 1/8, but batch-8 per-clip
            # 0.0092/0.0138 at unroll 1/8 — batched steps are
            # compute-dominated and unrolling only bloats the program.
            # CFG doubles the EFFECTIVE batch inside the scan body, so it
            # counts toward the gate (the B=1 unroll win was measured at
            # cfg_scale=0).
            # same static-branch rule as make_denoise_fn: a traced scale
            # means CFG is on (serving passes it as a jit argument)
            cfg_on = not (
                cfg_scale is None
                or (isinstance(cfg_scale, (int, float)) and cfg_scale <= 0.0)
            )
            effective_b = B * (2 if cfg_on else 1)
            unroll = cfg.diffusion.scan_unroll if effective_b == 1 else 1
            latent = ddpm_sample(
                self.schedule, denoise_fn, latent_shape, key, num_steps=steps,
                unroll=unroll,
            )
        elif sampler == "ddim":
            steps = num_steps or cfg.diffusion.ddim_steps
            latent = ddim_sample(
                self.schedule, denoise_fn, latent_shape, key, steps=steps,
                eta=cfg.diffusion.ddim_eta,
                unroll=cfg.diffusion.ddim_scan_unroll,
            )
        else:
            raise ValueError(f"unknown sampler {sampler!r}")

        q = self.vqvae.apply(
            vq_params, latent, emotion_one_hot, method="quant"
        )
        motion = self.vqvae.apply(vq_params, q.z_q, method="decode")
        return motion + template
