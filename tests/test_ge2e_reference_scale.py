"""Reference-scale GE2E config dry-run (VERDICT r4 §missing-4).

The campaign trains GE2E at reduced scale (600 epochs on the synthetic
corpus); nothing exercised the reference's full training configuration —
N=6 speakers × M=50 utterances per batch, 950 epochs, LSTM 768×3 → proj 256
(``GE2E/config/config.yaml:26-34``). This file ingests the reference YAML
VERBATIM, pins the schema values, and runs real optimization steps at the
exact N·M=300×120×40 batch shape through the production train step — a
compile-and-step check of the full-scale config (epoch count itself is a
loop bound, not a shape; two steps prove the program).
"""

import os

import numpy as np
import pytest

REF_YAML = "/root/reference/GE2E/config/config.yaml"

pytestmark = pytest.mark.skipif(not os.path.isfile(REF_YAML),
                                reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_ge2e():
    from spoofsv_tpu.config import GE2EConfig

    return GE2EConfig.from_yaml(REF_YAML)


def test_reference_yaml_values_ingested_verbatim(ref_ge2e):
    g = ref_ge2e
    assert (g.train.N, g.train.M) == (6, 50)
    assert g.train.epochs == 950
    assert g.train.lr == 0.01
    assert g.train.checkpoint_interval == 120
    assert (g.model.hidden, g.model.num_layer, g.model.proj) == (768, 3, 256)
    assert (g.data.sr, g.data.nfft, g.data.nmels) == (16000, 512, 40)
    assert g.data.tisv_frame == 120
    assert (g.test.N, g.test.M) == (20, 86)


@pytest.mark.slow
def test_reference_scale_train_step_compiles_and_improves(ref_ge2e):
    """Two optimizer steps at the reference's exact batch geometry
    (N=6 × M=50 crops of 120×40) with the reference-dim embedder. Proves
    the full-scale config's program compiles and the GE2E loss moves."""
    import jax
    import jax.numpy as jnp

    from spoofsv_tpu.models.ge2e import GE2ELoss, SpeechEmbedder
    from spoofsv_tpu.spoofkit.ge2e_harness import make_ge2e_train_step

    g = ref_ge2e
    emb = SpeechEmbedder(hidden=g.model.hidden, num_layers=g.model.num_layer,
                         proj=g.model.proj)
    init_fn, step_fn = make_ge2e_train_step(emb, GE2ELoss(), g.train.lr,
                                            n_speakers=g.train.N,
                                            donate=False)
    rng = np.random.default_rng(0)
    # speaker-structured synthetic crops so the contrastive loss is learnable
    centers = rng.normal(size=(g.train.N, 1, 1, g.data.nmels))
    batch = (centers + 0.3 * rng.normal(
        size=(g.train.N, g.train.M, g.data.tisv_frame, g.data.nmels))
    ).astype(np.float32)
    params, opt_state = init_fn(jax.random.PRNGKey(0), jnp.asarray(batch))
    losses = []
    for _ in range(2):
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(batch))
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[1] < losses[0], losses
