"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere (SURVEY.md §4:
multi-device logic is tested with a forced host-platform device count).
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS=axon (single real TPU chip),
# but the test suite runs on a virtual 8-device CPU mesh by design.
if not os.environ.get("SPOOFSV_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: XLA compiles dominate suite wall time on CPU.
# Platform-suffixed dir: entries written under the TPU-site env carry different
# CPU feature flags and spam AOT-mismatch warnings when reloaded.
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/spoofsv_jax_cache_" + ("cpu" if not os.environ.get(
                      "SPOOFSV_TEST_TPU") else "tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

if not os.environ.get("SPOOFSV_TEST_TPU"):
    # The TPU-tunnel site hook force-sets jax_platforms="axon,cpu" at its
    # registration time, trumping the env var — pin the config explicitly and
    # drop any already-initialized backends so tests stay on the CPU mesh.
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb  # noqa: E402

    if _xb.backends_are_initialized():  # pragma: no cover - site-hook dependent
        _xb._clear_backends()
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Fast/slow tier split (VERDICT r4 §weak-7: the 22-minute suite stopped being
# run before every commit, and a red parity test shipped). The tests below are
# marked `slow` centrally (by node-id substring, measured ≥ ~10 s each on the
# 1-CPU runner) so `scripts/test.sh --fast` (= -m "not slow") finishes in
# < 5 min and is cheap enough to run before every commit. The full suite
# remains the default `scripts/test.sh`.
#
# Kernel-parity tests (test_pallas_gl, SPSI/decode parity) are deliberately
# NOT in this list — catching kernel divergence pre-commit is the fast tier's
# whole point.
# ---------------------------------------------------------------------------
_SLOW_NODE_SUBSTRINGS = [
    "test_multihost.py::TestTwoProcessTraining::test_two_process_wgan_gp",
    "test_trainer_loop.py::TestOrdinaryTrainer::test_resume_roundtrip",
    "test_trainer_loop.py::TestOrdinaryTrainer::test_fit_validate_checkpoint",
    "test_trainer_loop.py::TestOrdinaryTrainer::test_loss_logs_kept",
    "test_trainer_loop.py::TestOrdinaryTrainer::test_val_loader_untouched",
    "test_trainer_loop.py::TestMeshTrainer::",
    "test_trainer_loop.py::TestAdversarialTrainer::test_g_d_alternation",
    "test_train.py::TestBF16Training::test_loss_trajectory_tracks_f32",
    "test_train.py::TestDataParallel::",
    "test_train.py::TestAdversarialSteps::test_variants_run_and_are_finite",
    "test_train.py::TestAdversarialSteps::test_ssrn_adversarial",
    "test_train.py::TestOrdinarySteps::test_text2mel_loss_decreases",
    "test_parallel_synth.py::TestDataParallelSynthesizer::test_sharded_matches_single_device",
    "test_parallel_synth.py::TestDataParallelSynthesizer::test_bench_mesh_flag",
    "test_cli.py::TestTrainingSmoke::",
    "test_cli.py::TestGraftEntry::test_entry_compiles_single_device",
    "test_models.py::TestDRS::test_forward_softmax",
    "test_spoofkit.py::TestDeviceSpeakerBank::test_train_ge2e_device_equals_host",
    "test_spoofkit.py::TestNospoofStagedEquivalence::test_staged_matches_slice",
    # second trim pass (measured fast tier 9:30 → target <5 min). The
    # pair-fusion / Winograd-adjacent conv arms are CLOSED experiments (not
    # production paths — docs/SSRN_PROFILE.json), serve/mesh e2e and model
    # shape smoke are covered by cheaper siblings; decode parity keeps its
    # fast [False] variant in the fast tier.
    "test_pallas_conv.py::test_text2mel_fused_pair_impl_matches_xla",
    "test_pallas_conv.py::test_ssrn_fused_pair_impl_matches_xla",
    "test_pallas_conv.py::test_custom_vjp_grads_match",
    "test_pallas_conv.py::test_fused_pair_matches_chained_fused",
    "test_pallas_conv.py::test_text2mel_fused_conv_impl_matches_xla",
    "test_pallas_decode.py::TestFusedDecodeParity::test_matches_scan_decoder[True]",
    "test_pallas_decode.py::TestFusedDecodeParity::test_long_rollout_rings_wrap",
    "test_pallas_decode.py::TestFusedDecodeParity::test_batch_tiling",
    "test_parallel_synth.py::TestDataParallelSynthesizer::test_shard_map_fused_kernels",
    "test_parallel_synth.py::TestDataParallelSynthesizer::test_shard_map_spsi_init",
    "test_train.py::TestAdversarialSteps::test_wgan_clips_weights",
    "test_train.py::TestOrdinarySteps::test_ssrn_loss_decreases",
    "test_models.py::TestCritics::test_sigmoid_variant_in_range",
    "test_models.py::TestCritics::test_scalar_output",
    "test_models.py::TestSSRN::test_upsamples_4x",
    "test_models.py::TestGE2E::test_embedder_shapes",
    "test_serve.py::test_device_pcm_matches_host_finalize",
    "test_serve.py::TestMeshServing::",
    "test_models.py::TestCMVariants::",
    "test_pallas_ops.py::TestGateImplSwitch::",
]


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(s in item.nodeid for s in _SLOW_NODE_SUBSTRINGS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_cfg():
    """A miniature Config for fast CPU tests (same structure, smaller dims)."""
    from spoofsv_tpu.config import Config

    cfg = Config()
    return cfg.replace(
        hidden_dim=32,
        text_emb_dim=16,
        ssrn_dim=24,
        disc_dim=16,
        spk_emb_dim=20,
        max_text_len=30,
        max_frame_num=24,
    )


@pytest.fixture(scope="session")
def mini_corpus(tmp_path_factory):
    """3 speakers × 8 utterances of short sine wavs at 22.05k + txt files."""
    from spoofsv_tpu.config import Config
    from spoofsv_tpu.data.vctk import prepare_vctk
    from spoofsv_tpu.dsp import host as dsp_host

    root = tmp_path_factory.mktemp("vctk")
    rng = np.random.default_rng(0)
    sr = 22050
    for s, spk in enumerate(["p225", "p226", "p315"]):  # p315 must be excluded
        os.makedirs(root / "wav48" / spk)
        os.makedirs(root / "txt" / spk)
        for u in range(8):
            n = sr // 2 + 1000 * u
            t = np.arange(n) / sr
            y = 0.4 * np.sin(2 * np.pi * (200 + 50 * s + 10 * u) * t)
            y += 0.01 * rng.normal(size=n)
            dsp_host.write_wav(str(root / "wav48" / spk / f"{spk}_{u:03d}.wav"),
                               y.astype(np.float32), sr)
            with open(root / "txt" / spk / f"{spk}_{u:03d}.txt", "w") as f:
                f.write(f"utterance number {u} for speaker {spk}.\n")
    os.makedirs(root / "spk_emb")
    for spk in ["p225", "p226"]:
        np.save(root / "spk_emb" / f"{spk}.npy",
                rng.normal(size=200).astype(np.float32))
    cfg = Config().replace(data_root_dir=str(root) + "/",
                           spk_emb_dir=str(root / "spk_emb") + "/")
    prepare_vctk(cfg, resample=True, verbose=False)
    return cfg
