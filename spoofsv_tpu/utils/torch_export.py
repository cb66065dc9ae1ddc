"""Export flax params to reference PyTorch checkpoints (``*.tar.pth``).

The exact inverse of :mod:`spoofsv_tpu.utils.torch_import`: a model trained
here can be saved in the reference repo's checkpoint schema
(``train/ordinary.py:271-284`` — a dict with ``model_state_dict`` under the
reference's parameter names) and loaded by the reference's
``models/TTSModel.py`` / ``GE2E/speech_embedder_net.py`` classes unchanged.
Round-trip (export → import) is exact and tested.

Inverse mapping rules (flax → torch):
  * Dense kernel (in, out)               → ``Conv1d(k=1)`` weight (out, in, 1)
    (or ``Linear`` weight (out, in) where the reference layer is a Linear)
  * Conv kernel (k, in, out)             → ``Conv1d`` weight (out, in, k)
  * ConvTranspose kernel (k, in, out), stored k-flipped → ``ConvTranspose1d``
    weight (in, out, k)
  * LayerNorm scale/bias                 → weight/bias
  * Embed.embedding (vocab, emb) + bias  → text ``Linear(vocab→emb)``
  * LSTM per-gate kernels (i,f,g,o)      → stacked ``weight_ih/hh_l{k}``; the
    flax recurrent bias carries the summed torch biases, exported as
    ``bias_ih`` with ``bias_hh`` zero (torch sums them — numerically equal).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x))


def _undense(out: Dict[str, np.ndarray], p: Mapping, name: str,
             conv1d: bool = True) -> None:
    w = _np(p["kernel"]).T                     # (out, in)
    out[f"{name}.weight"] = w[..., None] if conv1d else w
    if "bias" in p:
        out[f"{name}.bias"] = _np(p["bias"])


def _unconv(out, p, name) -> None:
    out[f"{name}.weight"] = _np(np.transpose(_np(p["kernel"]), (2, 1, 0)))
    if "bias" in p:
        out[f"{name}.bias"] = _np(p["bias"])


def _undeconv(out, p, name) -> None:
    k = _np(p["kernel"])[::-1]                 # un-flip the spatial axis
    out[f"{name}.weight"] = _np(np.transpose(k, (1, 2, 0)))
    if "bias" in p:
        out[f"{name}.bias"] = _np(p["bias"])


def _unln(out, p, name) -> None:
    out[f"{name}.weight"] = _np(p["scale"])
    out[f"{name}.bias"] = _np(p["bias"])


def _unhighway(out, p, name) -> None:
    _unconv(out, p["conv"], f"{name}.conv")
    _unln(out, p["ln1"], f"{name}.ln1")
    _unln(out, p["ln2"], f"{name}.ln2")


def _unhci(out, p, name) -> None:
    for i in range(1, 5):
        _unhighway(out, p[f"hc{i}"], f"{name}.hc{i}")


def _params(tree) -> Mapping:
    return tree["params"] if "params" in tree else tree


def export_melsyn(params) -> Dict[str, np.ndarray]:
    """flax MelSyn params → reference ``melSyn`` state_dict arrays."""
    p = _params(params)
    sd: Dict[str, np.ndarray] = {}
    te, pe = p["text_encoder"], "text_encoder"
    sd[f"{pe}.textemb_layer.W.weight"] = _np(te["embed"]["embedding"]).T.copy()
    sd[f"{pe}.textemb_layer.W.bias"] = _np(te["embed_bias"])
    for i in (1, 2):
        _undense(sd, te[f"conv{i}"], f"{pe}.conv{i}")
        _unln(sd, te[f"ln{i}"], f"{pe}.ln{i}")
        _unhci(sd, te[f"hci{i}"], f"{pe}.hci{i}")
    for i in (1, 2, 3, 4):
        _unhighway(sd, te[f"hc{i}"], f"{pe}.hc{i}")

    ae, pa = p["audio_encoder"], "audio_encoder"
    for i in (1, 2, 3):
        _undense(sd, ae[f"conv{i}"], f"{pa}.conv{i}")
        _unln(sd, ae[f"ln{i}"], f"{pa}.ln{i}")
    for i in (1, 2):
        _unhci(sd, ae[f"hci{i}"], f"{pa}.hci{i}")
        _unhighway(sd, ae[f"hc{i}"], f"{pa}.hc{i}")
    if "fc1" in ae:   # speaker conditioning (conditional pattern): Linear
        _undense(sd, ae["fc1"], f"{pa}.fc1", conv1d=False)
        _undense(sd, ae["fc2"], f"{pa}.fc2", conv1d=False)

    ad, pd = p["audio_decoder"], "audio_decoder"
    for i in (1, 2, 3, 4, 5):
        _undense(sd, ad[f"conv{i}"], f"{pd}.conv{i}")
        _unln(sd, ad[f"ln{i}"], f"{pd}.ln{i}")
    _unhci(sd, ad["hci"], f"{pd}.hci")
    for i in (1, 2):
        _unhighway(sd, ad[f"hc{i}"], f"{pd}.hc{i}")
    return sd


def export_ssrn(params) -> Dict[str, np.ndarray]:
    """flax SSRN params → reference ``SSRN`` state_dict arrays."""
    p = _params(params)
    sd: Dict[str, np.ndarray] = {}
    for i in range(1, 7):
        _undense(sd, p[f"conv{i}_dense"], f"conv{i}")
        _unln(sd, p[f"conv{i}_ln"], f"ln{i}")
    for i in range(1, 5):
        _unhighway(sd, p[f"hc{i}"], f"hc{i}")
    for u in (1, 2):
        _undeconv(sd, p[f"ups{u}"]["deconv"], f"ups{u}.deconv")
        _unhighway(sd, p[f"ups{u}"]["hc1"], f"ups{u}.hc1")
        _unhighway(sd, p[f"ups{u}"]["hc2"], f"ups{u}.hc2")
    return sd


def export_critic(params) -> Dict[str, np.ndarray]:
    """flax Critic1D params → reference ``melDisc``/``linDisc`` state_dict."""
    p = _params(params)
    sd: Dict[str, np.ndarray] = {}
    for i in range(1, 6):
        _undense(sd, p[f"conv{i}"], f"conv{i}")
    for i in range(1, 5):
        _unln(sd, p[f"ln{i}"], f"ln{i}")
    _unhighway(sd, p["hc"], "hc")
    return sd


def export_ge2e_embedder(params) -> Dict[str, np.ndarray]:
    """flax SpeechEmbedder params → reference ``SpeechEmbedder`` state_dict."""
    p = _params(params)
    sd: Dict[str, np.ndarray] = {}
    k = 0
    while f"lstm{k}" in p:
        g = p[f"lstm{k}"]
        wih = np.concatenate([_np(g[f"i{x}"]["kernel"]).T
                              for x in ("i", "f", "g", "o")], axis=0)
        whh = np.concatenate([_np(g[f"h{x}"]["kernel"]).T
                              for x in ("i", "f", "g", "o")], axis=0)
        b = np.concatenate([_np(g[f"h{x}"]["bias"])
                            for x in ("i", "f", "g", "o")], axis=0)
        sd[f"LSTM_stack.weight_ih_l{k}"] = wih
        sd[f"LSTM_stack.weight_hh_l{k}"] = whh
        sd[f"LSTM_stack.bias_ih_l{k}"] = b
        sd[f"LSTM_stack.bias_hh_l{k}"] = np.zeros_like(b)
        k += 1
    _undense(sd, p["projection"], "projection", conv1d=False)
    return sd


def save_reference_checkpoint(path: str, state_dict: Dict[str, np.ndarray],
                              epoch: int = 0, iteration: int = 0,
                              key: str = "model_state_dict",
                              extra: Mapping[str, Any] | None = None) -> None:
    """Write a reference-schema ``*.tar.pth`` (``train/ordinary.py:271-284``):
    a ``torch.save``-d dict with the state dict under ``key`` plus
    epoch/iteration counters.

    Loadable by the reference's inference loaders (synthesize.py:80-83) and,
    for the default ``key``, by its ordinary-training resume branch
    (train/ordinary.py:188-197), which additionally reads
    ``optimizer_state_dict`` and ``loss_val_log``: we emit a fresh Adam
    state (empty per-param state, one param group covering every tensor —
    ``optim.Adam.load_state_dict`` accepts it and starts the moments from
    zero, which is the honest semantics for a cross-framework export) and an
    empty validation-loss history unless ``extra`` overrides them. For the
    adversarial trainers' multi-net keys, pass the remaining nets/optimizers
    via ``extra``."""
    import torch

    ckpt: Dict[str, Any] = {
        "epoch": epoch,
        "iteration": iteration,
        key: {k: torch.from_numpy(np.asarray(v, np.float32).copy())
              for k, v in state_dict.items()},
    }
    if key == "model_state_dict":
        # config.json:38-41 Adam hyperparameters, one group per
        # model.parameters() tensor (these models' state_dicts are all
        # trainable parameters — no buffers).
        ckpt["optimizer_state_dict"] = {
            "state": {},
            "param_groups": [{
                "lr": 2e-4, "betas": (0.5, 0.9), "eps": 1e-6,
                "weight_decay": 0, "amsgrad": False, "maximize": False,
                "foreach": None, "capturable": False, "differentiable": False,
                "fused": None, "params": list(range(len(state_dict))),
            }],
        }
        ckpt["loss_val_log"] = []
    if extra:
        ckpt.update(extra)
    torch.save(ckpt, path)
