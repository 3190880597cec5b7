"""End-to-end CLI tests: the full reference entry-point surface
(train -> sample -> demo -> metrics -> render) driven in-process on tiny
synthetic configs."""

import json
import os

import numpy as np
import pytest


def _run(module, argv):
    return module.main(argv)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli")
    old = os.getcwd()
    os.chdir(path)
    yield path
    os.chdir(old)


BASE = ["--dataset", "vocaset", "--synthetic", "--tiny"]


@pytest.fixture(scope="module")
def stage1_params(workdir):
    from fdm_tpu.cli import train_vqvae

    assert _run(
        train_vqvae,
        BASE + ["--epochs", "1", "--output_dir", "s1"],
    ) == 0
    path = "s1/vocaset_vqvae_params.msgpack"
    assert os.path.exists(path)
    return path


@pytest.fixture(scope="module")
def stage2_params(workdir, stage1_params):
    from fdm_tpu.cli import train_diffusion

    assert _run(
        train_diffusion,
        BASE + ["--epochs", "1", "--stage1", stage1_params,
                "--output_dir", "s2"],
    ) == 0
    path = "s2/vocaset_fdm_params.msgpack"
    assert os.path.exists(path)
    return path


def test_sample_vqvae_roundtrip(workdir, stage1_params):
    from fdm_tpu.cli import sample_vqvae

    assert _run(
        sample_vqvae,
        BASE + ["--params", stage1_params, "--output_dir", "vq_out"],
    ) == 0
    files = [f for f in os.listdir("vq_out") if f.endswith(".npy")]
    assert len(files) == 2
    arr = np.load(os.path.join("vq_out", files[0]))
    assert arr.ndim == 2 and arr.shape[1] == 30 and np.isfinite(arr).all()


def test_sample_diffusion_with_conditions(workdir, stage1_params, stage2_params):
    from fdm_tpu.cli import sample_diffusion

    assert _run(
        sample_diffusion,
        BASE + ["--stage1", stage1_params, "--stage2", stage2_params,
                "--output_dir", "diff_out", "--all_conditions",
                "--steps", "3"],
    ) == 0
    files = sorted(os.listdir("diff_out"))
    # 2 test records x 8 identity conditions
    assert len(files) == 16
    assert any("_condition_0" in f for f in files)


def test_sample_diffusion_dp_matches_single_device(
    workdir, stage1_params, stage2_params
):
    """--dp shards each batch over the 8-device test mesh (padding partial
    chunks to the device count) and must reproduce the single-device
    outputs: the sampler's (B, L, C) noise draws are row-major, so a padded
    draw's leading rows equal the unpadded draw and padding rows only add
    discarded work."""
    from fdm_tpu.cli import sample_diffusion

    common = BASE + [
        "--stage1", stage1_params, "--stage2", stage2_params,
        "--steps", "3", "--batch_size", "2",
    ]
    assert _run(
        sample_diffusion, common + ["--output_dir", "dp_ref"]
    ) == 0
    assert _run(
        sample_diffusion, common + ["--output_dir", "dp_out", "--dp"]
    ) == 0
    files = sorted(os.listdir("dp_ref"))
    assert files and files == sorted(os.listdir("dp_out"))
    for fname in files:
        a = np.load(os.path.join("dp_ref", fname))
        b = np.load(os.path.join("dp_out", fname))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_demo_and_render(workdir, stage1_params, stage2_params):
    from fdm_tpu.cli import demo, render

    assert _run(
        demo,
        BASE + ["--stage1", stage1_params, "--stage2", stage2_params,
                "--output", "demo_out/gen.npy", "--steps", "3"],
    ) == 0
    arr = np.load("demo_out/gen.npy")
    assert arr.ndim == 2 and np.isfinite(arr).all()

    assert _run(
        render,
        ["--pred_path", "demo_out/gen.npy", "--output_dir", "videos",
         "--fps", "30", "--size", "64"],
    ) == 0
    assert os.path.getsize("videos/gen.mp4") > 0


def test_demo_render_muxes_input_audio(workdir, stage1_params,
                                       stage2_params, monkeypatch):
    """demo --render with a real wav replaces the reference's demo+render
    script pair in one command: it writes the npy, the mp4, and (ffmpeg
    forced absent) the audio-muxed MJPEG+PCM .avi from the SAME input
    audio."""
    import shutil as _shutil
    from scipy.io import wavfile
    from fdm_tpu.cli import demo

    monkeypatch.setattr(_shutil, "which", lambda name: None)

    sr = 16000
    wavfile.write(
        "demo_in.wav", sr,
        (np.sin(np.arange(sr) * 0.03) * 15000).astype(np.int16),
    )
    assert _run(
        demo,
        BASE + ["--stage1", stage1_params, "--stage2", stage2_params,
                "--audio_file", "demo_in.wav",
                "--output", "demo_out/gen_av.npy", "--steps", "2",
                "--render", "--render_size", "48"],
    ) == 0
    assert os.path.getsize("demo_out/gen_av.mp4") > 0
    buf = open("demo_out/gen_av.avi", "rb").read()
    assert buf[:4] == b"RIFF" and b"MJPG" in buf and b"01wb" in buf


def test_demo_emotion_labels_match_training_encoding():
    """The demo's --emotion choices must encode exactly like the MEAD
    training labels: training order for the 7 classes, all-zeros for
    'neutral' (a demo-local ordering once conditioned 'sad' on the
    'surprised' class vector)."""
    from fdm_tpu.cli.demo import EMOTIONS as DEMO_EMOTIONS
    from fdm_tpu.data.mead import EMOTIONS as TRAIN_EMOTIONS, emotion_one_hot

    assert set(DEMO_EMOTIONS) == set(TRAIN_EMOTIONS) | {"neutral"}
    np.testing.assert_array_equal(
        emotion_one_hot("sad"),
        np.eye(7, dtype=np.float32)[TRAIN_EMOTIONS.index("sad")],
    )
    np.testing.assert_array_equal(emotion_one_hot("neutral"), np.zeros(7))
    np.testing.assert_array_equal(
        emotion_one_hot("fearful"), emotion_one_hot("fear")
    )


def test_metrics_cli(workdir, stage1_params, stage2_params, capsys):
    from fdm_tpu.cli import metrics

    os.makedirs("gt", exist_ok=True)
    rng = np.random.RandomState(0)
    for fname in os.listdir("diff_out"):
        stem = fname[:-4].split("_condition_")[0]
        arr = np.load(os.path.join("diff_out", fname))
        np.save(
            os.path.join("gt", stem + ".npy"),
            arr + 0.01 * rng.randn(*arr.shape).astype(np.float32),
        )
    np.save("lip.npy", np.arange(4))
    np.save("upper.npy", np.arange(4, 8))
    # FDD needs an explicit template (fabricating zeros silently skews the
    # motion-std statistic); a flat .npy template applies to every clip
    any_pred = np.load(
        os.path.join("diff_out", os.listdir("diff_out")[0])
    )
    np.save("tmpl.npy", np.zeros(any_pred.shape[-1], np.float32))
    assert _run(
        metrics,
        ["--pred_path", "diff_out", "--gt_path", "gt",
         "--lip_region", "lip.npy", "--upper_region", "upper.npy",
         "--templates", "tmpl.npy", "--json"],
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in ("lve", "mve", "fdd", "abs_fdd", "diversity", "ave"):
        assert key in out and np.isfinite(out[key])
    # without templates FDD is skipped with a note instead of fabricated
    assert _run(
        metrics,
        ["--pred_path", "diff_out", "--gt_path", "gt",
         "--lip_region", "lip.npy", "--upper_region", "upper.npy", "--json"],
    ) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "fdd" not in out2 and "lve" in out2


def test_mead_demo_with_flame(workdir):
    from fdm_tpu.cli import demo

    assert _run(
        demo,
        ["--dataset", "mead", "--synthetic", "--tiny", "--emotion", "happy",
         "--steps", "2", "--output", "mead_demo/gen.npy"],
    ) == 0
    assert np.isfinite(np.load("mead_demo/gen.npy")).all()


def test_dispatcher_lists_commands(capsys):
    from fdm_tpu.__main__ import main

    assert main(["--help"]) == 0
    assert "train-vqvae" in capsys.readouterr().out
    assert main([]) == 2
    assert main(["bogus"]) == 2


def test_preprocess_vocaset(workdir):
    import pickle

    from fdm_tpu.cli import preprocess_vocaset

    rng = np.random.RandomState(1)
    verts = rng.randn(10, 15, 3).astype(np.float32)
    np.save("raw_verts.npy", verts)
    index = {"subjA": {"sentence01": {i: i for i in range(5)},
                       "sentence02": {i: 5 + i for i in range(5)}}}
    with open("idx.pkl", "wb") as f:
        pickle.dump(index, f)
    audio = {"subjA": {"sentence01": {
        "sample_rate": 16000,
        "audio": (rng.randn(800) * 1000).astype(np.int16),
    }}}
    with open("audio.pkl", "wb") as f:
        pickle.dump(audio, f)

    assert _run(
        preprocess_vocaset,
        ["--verts_path", "raw_verts.npy", "--raw_audio_path", "audio.pkl",
         "--data2array_verts_path", "idx.pkl", "--vertices_npy_path", "vnp",
         "--wav_path", "wavs", "--vertices_dim", "45"],
    ) == 0
    seq = np.load("vnp/subjA_sentence01.npy")
    assert seq.shape == (5, 45)
    np.testing.assert_allclose(seq, verts[:5].reshape(5, 45))
    assert os.path.exists("wavs/subjA_sentence01.wav")


def test_convert_weights_vqvae(workdir):
    """Reference-container torch checkpoint -> msgpack via the CLI, loadable
    by sample_vqvae."""
    import argparse

    import torch

    from fdm_tpu.cli import convert_weights, sample_vqvae
    from reference_oracle import import_reference_module

    # tiny BIWI-style reference model matching the --tiny biwi preset
    ref_mod = import_reference_module("models.vq_vae")
    torch.manual_seed(0)
    ns = argparse.Namespace(
        n_embed=16, zquant_dim=8, in_dim=30, hidden_size=32, neg=0.2,
        quant_factor=0, INaffine=False, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=48, face_quan_num=4,
    )
    ref = ref_mod.VQAutoEncoder(ns).eval()
    # the reference's .mpt container layout (train/train_vocaset_vqvae.py)
    torch.save({"epoch": 1, "model": ref.state_dict(), "opt": {}},
               "ref_ckpt.mpt")

    assert convert_weights.main(
        ["--kind", "vqvae", "--dataset", "biwi", "--tiny", "--checkpoint",
         "ref_ckpt.mpt", "--output", "conv/vq.msgpack"]
    ) == 0

    assert sample_vqvae.main(
        ["--dataset", "biwi", "--synthetic", "--tiny",
         "--params", "conv/vq.msgpack", "--output_dir", "conv_out"]
    ) == 0
    files = [f for f in os.listdir("conv_out") if f.endswith(".npy")]
    assert files and np.isfinite(np.load(os.path.join("conv_out", files[0]))).all()


def test_convert_weights_fdm_strips_diffusion_prefix(workdir):
    """Stage-2 checkpoints store the FDM under GaussianDiffusion as
    denoise_fn.*; the converter must strip it and produce params our FDM
    loads."""
    import sys

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_fdm import TorchFDMReplica, small_cfg
    from fdm_tpu.cli import convert_weights
    from fdm_tpu.cli.common import load_params
    from fdm_tpu.configs import FDMConfig
    from fdm_tpu.models import FDM
    from fdm_tpu.ops.masks import alibi_biased_mask
    from fdm_tpu.ops.positional import sinusoidal_table

    torch.manual_seed(2)
    cfg = small_cfg()
    alibi = torch.from_numpy(
        alibi_biased_mask(cfg.n_head, cfg.max_seq_len, cfg.alibi_period)
    )
    pe = torch.from_numpy(sinusoidal_table(cfg.max_seq_len, cfg.feature_dim))
    replica = TorchFDMReplica(cfg, alibi, pe).eval()
    sd = {
        "denoise_fn."
        + k.replace("decoder.layers.", "transformer_decoder.layers."): v
        for k, v in replica.state_dict().items()
    }
    torch.save({"model": sd}, "fdm_ckpt.mpt")

    overrides = []
    for key, val in [
        ("fdm.feature_dim", 32), ("fdm.n_head", 4), ("fdm.num_layers", 2),
        ("fdm.audio_dim", 24), ("fdm.tokens_per_frame", 4),
        ("fdm.num_timesteps", 50), ("fdm.max_seq_len", 40),
        ("fdm.style_classes", 5),
    ]:
        overrides += ["--set", f"{key}={val}"]
    assert convert_weights.main(
        ["--kind", "fdm", "--dataset", "mead", "--checkpoint", "fdm_ckpt.mpt",
         "--output", "conv/fdm.msgpack"] + overrides
    ) == 0

    import jax
    import jax.numpy as jnp

    params = load_params("conv/fdm.msgpack")
    model = FDM(cfg)
    B, T = 1, 6
    L, C = T * 4, 8
    out = model.apply(
        params,
        jnp.zeros((B, L, C)), jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, T, 48)), jnp.eye(5)[:B], jnp.eye(7)[:B],
    )
    assert np.isfinite(np.asarray(out)).all()


def test_train_resume_continues_from_checkpoint(workdir):
    """--resume restores params+opt+step from the orbax checkpoint and keeps
    counting toward the TOTAL --epochs budget (the original restores only
    model weights; optimizer restore is commented out there)."""
    import json

    from fdm_tpu.cli import train_vqvae

    args = BASE + ["--output_dir", "resume_t", "--epochs", "2",
                   "--set", "train.checkpoint_every=1"]
    assert train_vqvae.main(args) == 0
    # 8 train records / batch 1 -> 8 steps per epoch; 2 epochs = 16 steps.
    # Resuming with a total budget of 3 runs exactly ONE more epoch.
    assert train_vqvae.main(
        args + ["--resume", "--epochs", "3"]
    ) == 0

    steps = [
        json.loads(l)["step"]
        for l in open("runs/vocaset_vqvae.jsonl")
        if json.loads(l).get("kind") == "step"
    ]
    # the resumed run continues past the first run's 16 steps
    assert max(steps) == 24, sorted(set(steps))[-5:]
    prog = json.load(open("resume_t/progress.json"))
    assert prog == {"epoch": 3, "step": 24}

    # a budget the run has already met trains zero further steps but still
    # exports the final params
    assert train_vqvae.main(args + ["--resume", "--epochs", "3"]) == 0
    steps = [
        json.loads(l)["step"]
        for l in open("runs/vocaset_vqvae.jsonl")
        if json.loads(l).get("kind") == "step"
    ]
    assert max(steps) == 24


def test_resume_start_epoch_mapping(tmp_path):
    """Step->epoch mapping: exact at the recorded epoch, proportional for an
    older checkpoint, 0 without a progress file (legacy runs keep the old
    run-the-full-budget behavior)."""
    from fdm_tpu.cli.common import resume_start_epoch, save_progress

    d = str(tmp_path)
    assert resume_start_epoch(d, 16) == 0          # no progress.json
    save_progress(d, 4, 32)                        # 8 steps/epoch
    assert resume_start_epoch(d, 32) == 4          # checkpoint == last epoch
    assert resume_start_epoch(d, 40) == 4          # newer step, clamp to last
    assert resume_start_epoch(d, 16) == 2          # older checkpoint
    assert resume_start_epoch(d, 0) == 0


def test_metrics_with_flame_param_gt(workdir, capsys):
    """--gt_is_flame_params decodes MEAD (T, 56) GT through FLAME before
    comparison (reference metric/metric.py decodes GT on the fly)."""
    import jax.numpy as jnp

    from fdm_tpu.cli import metrics
    from fdm_tpu.cli.common import FlameDecoder, build_config

    class _A:
        dataset, tiny, overrides, data_root, synthetic, seed = (
            "mead", False, [], None, True, 0,
        )

    rng = np.random.RandomState(3)
    params = rng.randn(6, 56).astype(np.float32) * 0.01
    os.makedirs("fp_gt", exist_ok=True)
    os.makedirs("fp_pred", exist_ok=True)
    np.save("fp_gt/clip.npy", params)
    # prediction = decoded GT + noise (uses the same synthetic FLAME model
    # the CLI builds, seed-deterministic)
    dec = FlameDecoder(build_config(_A()), None)
    verts = np.asarray(dec(jnp.asarray(params)[None]))[0]
    np.save("fp_pred/clip.npy",
            verts + 0.001 * rng.randn(*verts.shape).astype(np.float32))
    np.save("fp_lip.npy", np.arange(10))

    assert metrics.main(
        ["--pred_path", "fp_pred", "--gt_path", "fp_gt",
         "--lip_region", "fp_lip.npy", "--gt_is_flame_params", "--json"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["lve"]) and out["lve"] < 1e-3


def test_convert_weights_audio_hf_checkpoint(workdir):
    """Converted HF audio weights drive the JAX encoder to the same outputs
    as the torch model (the library path behind convert-weights --kind audio)."""
    import jax.numpy as jnp
    import torch
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    from fdm_tpu.audio import AudioEncoder
    from fdm_tpu.audio.encoder import AudioEncoderConfig

    torch.manual_seed(0)
    hf_cfg = Wav2Vec2Config(
        hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=48, conv_dim=[16, 16, 16], conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2], conv_bias=False, feat_extract_norm="group",
        do_stable_layer_norm=False, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        apply_spec_augment=False,
    )
    hf = Wav2Vec2Model(hf_cfg).eval()
    from fdm_tpu.audio.convert import convert_hf_audio_encoder

    enc_cfg = AudioEncoderConfig(
        hidden_size=24, num_layers=2, num_heads=4, intermediate_size=48,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    params = convert_hf_audio_encoder(hf.state_dict(), enc_cfg)

    wav = np.random.RandomState(1).randn(1, 3200).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    got = AudioEncoder(enc_cfg).apply(
        params, jnp.asarray(wav), even_trim=False
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_preprocess_mead_audio(tmp_path, monkeypatch):
    """wav sources resample in-process; compressed sources route through the
    converter template; missing decoder fails with actionable guidance."""
    import numpy as np
    from scipy.io import wavfile

    from fdm_tpu.cli import preprocess_mead_audio as ppa

    src = tmp_path / "mead" / "spk1"
    src.mkdir(parents=True)
    t = np.linspace(0, 1, 48000, endpoint=False)
    wavfile.write(
        str(src / "a.wav"), 48000,
        (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
    )
    dst = tmp_path / "wav"

    rc = ppa.main(["--src", str(tmp_path / "mead"), "--dst", str(dst)])
    assert rc == 0
    sr, data = wavfile.read(str(dst / "spk1" / "a.wav"))
    assert sr == 16000 and abs(len(data) - 16000) <= 2
    # resample preserves the tone's dominant frequency
    spec = np.abs(np.fft.rfft(data.astype(np.float64)))
    assert abs(np.argmax(spec) * sr / len(data) - 220) < 5

    # compressed source + fake converter template
    (src / "b.m4a").write_bytes(b"\x00fakem4a")
    fake = tmp_path / "fakeconv.py"
    fake.write_text(
        "import sys, numpy as np\nfrom scipy.io import wavfile\n"
        "wavfile.write(sys.argv[2], int(sys.argv[3]), "
        "np.zeros(100, np.float32))\n"
    )
    import sys as _sys

    rc = ppa.main([
        "--src", str(tmp_path / "mead"), "--dst", str(dst),
        "--converter", f"{_sys.executable} {fake} {{src}} {{dst}} {{sr}}",
    ])
    assert rc == 0
    sr_b, data_b = wavfile.read(str(dst / "spk1" / "b.wav"))
    assert sr_b == 16000 and len(data_b) == 100

    # compressed source with NO decoder available -> actionable SystemExit
    import shutil as _shutil

    (src / "c.m4a").write_bytes(b"\x00fakem4a")
    monkeypatch.setattr(_shutil, "which", lambda _: None)
    with pytest.raises(SystemExit, match="ffmpeg"):
        ppa.main(["--src", str(tmp_path / "mead"), "--dst", str(dst)])


def test_train_vqvae_fsdp(workdir):
    """--fsdp trains with params + Adam moments ZeRO-sharded over the
    8-device mesh; without a mesh (batch 1) it must fail loudly."""
    import pytest

    from fdm_tpu.cli import train_vqvae

    args = BASE + ["--output_dir", "fsdp_t", "--epochs", "1",
                   "--set", "train.batch_size=8", "--fsdp"]
    assert train_vqvae.main(args) == 0

    with pytest.raises(SystemExit, match="fsdp"):
        train_vqvae.main(BASE + ["--output_dir", "fsdp_t2", "--fsdp"])


def test_preprocess_mead_audio_flatten_collision_and_atomicity(tmp_path):
    """--flatten must fail loudly when basenames collide (MEAD reuses clip
    names across speakers), and a failed conversion leaves no output for a
    re-run to skip as complete."""
    import numpy as np
    import pytest
    from scipy.io import wavfile

    from fdm_tpu.cli import preprocess_mead_audio as ppa

    src = tmp_path / "AUDIO"
    (src / "M003" / "angry").mkdir(parents=True)
    (src / "M005" / "happy").mkdir(parents=True)
    tone = (np.sin(np.arange(1600) / 10.0) * 0.3).astype(np.float32)
    wavfile.write(str(src / "M003" / "angry" / "001.wav"), 48000, tone)
    wavfile.write(str(src / "M005" / "happy" / "001.wav"), 48000, tone)

    with pytest.raises(SystemExit, match="collision"):
        ppa.process(str(src), str(tmp_path / "flat"), 16000, True, None)

    # in-place run resamples wrong-rate wavs over themselves (that's where
    # the MEAD loader looks); the second run sees 16 kHz and skips
    done, skipped = ppa.process(str(src), str(src), 16000, False, None)
    assert done == 2 and skipped == 0
    sr, data = wavfile.read(str(src / "M003" / "angry" / "001.wav"))
    assert sr == 16000 and len(data) > 0
    done2, skipped2 = ppa.process(str(src), str(src), 16000, False, None)
    assert done2 == 0 and skipped2 == 2


def test_convert_weights_fdm_strips_double_prefix(workdir):
    """module.denoise_fn.* (a DataParallel-wrapped GaussianDiffusion
    checkpoint) sheds BOTH prefixes — 'module.' must strip first."""
    import sys

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_fdm import TorchFDMReplica, small_cfg
    from fdm_tpu.cli import convert_weights
    from fdm_tpu.cli.common import load_params
    from fdm_tpu.ops.masks import alibi_biased_mask
    from fdm_tpu.ops.positional import sinusoidal_table

    torch.manual_seed(3)
    cfg = small_cfg()
    alibi = torch.from_numpy(
        alibi_biased_mask(cfg.n_head, cfg.max_seq_len, cfg.alibi_period)
    )
    pe = torch.from_numpy(sinusoidal_table(cfg.max_seq_len, cfg.feature_dim))
    replica = TorchFDMReplica(cfg, alibi, pe).eval()
    sd = {
        "module.denoise_fn."
        + k.replace("decoder.layers.", "transformer_decoder.layers."): v
        for k, v in replica.state_dict().items()
    }
    torch.save({"model": sd}, "fdm_dp_ckpt.mpt")

    overrides = []
    for key, val in [
        ("fdm.feature_dim", 32), ("fdm.n_head", 4), ("fdm.num_layers", 2),
        ("fdm.audio_dim", 24), ("fdm.tokens_per_frame", 4),
        ("fdm.num_timesteps", 50), ("fdm.max_seq_len", 40),
        ("fdm.style_classes", 5),
    ]:
        overrides += ["--set", f"{key}={val}"]
    assert convert_weights.main(
        ["--kind", "fdm", "--dataset", "mead", "--checkpoint",
         "fdm_dp_ckpt.mpt", "--output", "conv/fdm_dp.msgpack"] + overrides
    ) == 0
    params = load_params("conv/fdm_dp.msgpack")
    assert "params" in params and len(params["params"]) > 0


def test_preprocess_inplace_24bit_wav_skip_scan(tmp_path):
    """The in-place skip scan reads wav headers via mmap, which scipy
    rejects for 3-byte (24-bit) PCM containers — the fallback full read
    must keep the run alive (round-3 review finding)."""
    import struct

    import numpy as np
    from scipy.io import wavfile

    from fdm_tpu.cli import preprocess_mead_audio as ppa

    d = tmp_path / "wav" / "spk"
    d.mkdir(parents=True)
    # hand-build a minimal 24-bit PCM RIFF file at the target rate
    sr, n = 16000, 64
    frames = b"".join(
        struct.pack("<i", (i * 1000) % (1 << 22))[:3] for i in range(n)
    )
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(frames)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 3, 3, 24)
        + b"data" + struct.pack("<I", len(frames))
    )
    (d / "deep.wav").write_bytes(hdr + frames)
    # sanity: mmap really is rejected for this container
    try:
        wavfile.read(str(d / "deep.wav"), mmap=True)
        assert False, "expected mmap rejection for 24-bit PCM"
    except ValueError:
        pass
    # plus a normal 16-bit file needing no work
    t = np.linspace(0, 0.1, sr // 10, endpoint=False)
    wavfile.write(str(d / "ok.wav"), sr,
                  (1000 * np.sin(2 * np.pi * 220 * t)).astype(np.int16))

    rc = ppa.main(["--src", str(tmp_path / "wav"),
                   "--dst", str(tmp_path / "wav")])
    assert rc == 0  # both files already at 16 kHz -> skipped, no crash


def test_use_pallas_training_falls_back_to_table(workdir, capsys):
    """train.use_pallas with fdm.dropout > 0 must not crash mid-epoch: the
    fused kernel cannot represent attention-weight dropout, so training
    falls back to the bias-table attention with a printed note (round-3
    review finding)."""
    from fdm_tpu.cli import train_diffusion

    args = BASE + ["--output_dir", "pallas_t", "--epochs", "1",
                   "--set", "train.use_pallas=True"]
    assert train_diffusion.main(args) == 0
    out = capsys.readouterr().out
    assert "bias-table attention" in out


def test_render_rejects_nonpositive_fps_and_size(tmp_path):
    """--fps 0 would divide by zero in the AVI muxer's avih header and
    cv2's writer; fail loudly at the argument boundary instead."""
    from fdm_tpu.cli import render

    pred = str(tmp_path / "clip.npy")
    np.save(pred, np.zeros((2, 30), np.float32))
    for argv in (
        ["--pred_path", pred, "--fps", "0"],
        ["--pred_path", pred, "--fps", "-3"],
        ["--pred_path", pred, "--size", "0"],
    ):
        with pytest.raises(SystemExit):
            render.main(argv + ["--output_dir", str(tmp_path / "out")])
