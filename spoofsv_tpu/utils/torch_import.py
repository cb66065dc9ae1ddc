"""Import reference PyTorch checkpoints (``*.tar.pth``) into flax params.

Lets a user of the reference repo reuse their trained Text2Mel / SSRN /
discriminator / GE2E weights directly with this framework (checkpoint schema:
``train/ordinary.py:271-284``, ``GE2E/train_speech_embedder.py:98-109``).

Mapping rules (torch → flax, time-major layout):
  * ``Conv1d(k=1)`` weight (out, in, 1)  → Dense kernel (in, out)
  * ``Conv1d(k>1)`` weight (out, in, k)  → Conv kernel (k, in, out)
  * ``ConvTranspose1d`` weight (in, out, k) → ConvTranspose kernel (k, in, out)
  * ``Linear`` weight (out, in)          → Dense kernel (in, out)
  * ``LayerNorm`` weight/bias            → scale/bias
  * text embedding ``Linear(vocab→emb)`` → Embed.embedding (vocab, emb) + bias
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _load_state_dict(path: str, key: str = "model_state_dict") -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt[key] if isinstance(ckpt, dict) and key in ckpt else ckpt
    return {k: v.detach().numpy() for k, v in sd.items()}


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _dense(sd, name):
    w = _np(sd[f"{name}.weight"])
    out = {"kernel": np.ascontiguousarray(w.squeeze(-1).T if w.ndim == 3 else w.T)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _conv(sd, name):
    w = _np(sd[f"{name}.weight"])       # (out, in, k)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _deconv(sd, name):
    # flax ConvTranspose convolves with the kernel spatially FLIPPED relative
    # to torch's ConvTranspose1d cross-correlation — flip the k axis.
    w = _np(sd[f"{name}.weight"])       # (in, out, k)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1])}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _ln(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _highway(sd, name):
    return {"conv": _conv(sd, f"{name}.conv"),
            "ln1": _ln(sd, f"{name}.ln1"),
            "ln2": _ln(sd, f"{name}.ln2")}


def _hci(sd, name):
    return {f"hc{i}": _highway(sd, f"{name}.hc{i}") for i in range(1, 5)}


def import_melsyn(path_or_sd) -> Dict[str, Any]:
    """Reference ``melSyn`` state_dict → flax params for models.MelSyn."""
    sd = (_load_state_dict(path_or_sd) if isinstance(path_or_sd, str)
          else dict(path_or_sd))
    te = "text_encoder"
    ae = "audio_encoder"
    ad = "audio_decoder"
    text_encoder = {
        "embed": {"embedding": np.ascontiguousarray(
            _np(sd[f"{te}.textemb_layer.W.weight"]).T)},
        "embed_bias": _np(sd[f"{te}.textemb_layer.W.bias"]),
        "conv1": _dense(sd, f"{te}.conv1"),
        "ln1": _ln(sd, f"{te}.ln1"),
        "conv2": _dense(sd, f"{te}.conv2"),
        "ln2": _ln(sd, f"{te}.ln2"),
        "hci1": _hci(sd, f"{te}.hci1"),
        "hci2": _hci(sd, f"{te}.hci2"),
        "hc1": _highway(sd, f"{te}.hc1"),
        "hc2": _highway(sd, f"{te}.hc2"),
        "hc3": _highway(sd, f"{te}.hc3"),
        "hc4": _highway(sd, f"{te}.hc4"),
    }
    audio_encoder = {
        "conv1": _dense(sd, f"{ae}.conv1"),
        "ln1": _ln(sd, f"{ae}.ln1"),
        "conv2": _dense(sd, f"{ae}.conv2"),
        "ln2": _ln(sd, f"{ae}.ln2"),
        "conv3": _dense(sd, f"{ae}.conv3"),
        "ln3": _ln(sd, f"{ae}.ln3"),
        "hci1": _hci(sd, f"{ae}.hci1"),
        "hci2": _hci(sd, f"{ae}.hci2"),
        "hc1": _highway(sd, f"{ae}.hc1"),
        "hc2": _highway(sd, f"{ae}.hc2"),
    }
    if f"{ae}.fc1.weight" in sd:
        audio_encoder["fc1"] = _dense(sd, f"{ae}.fc1")
        audio_encoder["fc2"] = _dense(sd, f"{ae}.fc2")
    audio_decoder = {
        "conv1": _dense(sd, f"{ad}.conv1"),
        "ln1": _ln(sd, f"{ad}.ln1"),
        "hci": _hci(sd, f"{ad}.hci"),
        "hc1": _highway(sd, f"{ad}.hc1"),
        "hc2": _highway(sd, f"{ad}.hc2"),
        "conv2": _dense(sd, f"{ad}.conv2"),
        "ln2": _ln(sd, f"{ad}.ln2"),
        "conv3": _dense(sd, f"{ad}.conv3"),
        "ln3": _ln(sd, f"{ad}.ln3"),
        "conv4": _dense(sd, f"{ad}.conv4"),
        "ln4": _ln(sd, f"{ad}.ln4"),
        "conv5": _dense(sd, f"{ad}.conv5"),
        "ln5": _ln(sd, f"{ad}.ln5"),
    }
    return {"params": {"text_encoder": text_encoder,
                       "audio_encoder": audio_encoder,
                       "audio_decoder": audio_decoder}}


def import_ssrn(path_or_sd) -> Dict[str, Any]:
    """Reference ``SSRN`` state_dict → flax params for models.SSRN."""
    sd = (_load_state_dict(path_or_sd) if isinstance(path_or_sd, str)
          else dict(path_or_sd))
    params: Dict[str, Any] = {}
    for i in range(1, 7):
        params[f"conv{i}_dense"] = _dense(sd, f"conv{i}")
        params[f"conv{i}_ln"] = _ln(sd, f"ln{i}")
    for i in range(1, 5):
        params[f"hc{i}"] = _highway(sd, f"hc{i}")
    for u in (1, 2):
        params[f"ups{u}"] = {
            "deconv": _deconv(sd, f"ups{u}.deconv"),
            "hc1": _highway(sd, f"ups{u}.hc1"),
            "hc2": _highway(sd, f"ups{u}.hc2"),
        }
    return {"params": params}


def import_critic(path_or_sd) -> Dict[str, Any]:
    """Reference ``melDisc``/``linDisc`` state_dict → flax params for Critic1D."""
    sd = (_load_state_dict(path_or_sd, key="disc_state_dict")
          if isinstance(path_or_sd, str) else dict(path_or_sd))
    params = {f"conv{i}": _dense(sd, f"conv{i}") for i in range(1, 6)}
    for i in range(1, 5):
        params[f"ln{i}"] = _ln(sd, f"ln{i}")
    params["hc"] = _highway(sd, "hc")
    return {"params": params}


def import_ge2e_embedder(path_or_sd) -> Dict[str, Any]:
    """Reference ``SpeechEmbedder`` state_dict → flax params for SpeechEmbedder.

    torch LSTM gate order is (i, f, g, o) stacked in weight_ih_l{k} (4H, in);
    flax OptimizedLSTMCell keeps separate dense kernels per gate (i, f, g, o)
    with kernel (in, H).
    """
    sd = (_load_state_dict(path_or_sd, key=None) if isinstance(path_or_sd, str)
          else dict(path_or_sd))
    params: Dict[str, Any] = {}
    k = 0
    while f"LSTM_stack.weight_ih_l{k}" in sd:
        wih = sd[f"LSTM_stack.weight_ih_l{k}"]   # (4H, in)
        whh = sd[f"LSTM_stack.weight_hh_l{k}"]   # (4H, H)
        bih = sd[f"LSTM_stack.bias_ih_l{k}"]
        bhh = sd[f"LSTM_stack.bias_hh_l{k}"]
        h = whh.shape[1]
        gates = {}
        # flax OptimizedLSTMCell: input kernels i{i,f,g,o} carry no bias; the
        # recurrent kernels h{i,f,g,o} carry the (summed) bias.
        for gi, g in enumerate(("i", "f", "g", "o")):
            wi = np.asarray(wih[gi * h:(gi + 1) * h])   # (H, in)
            wh = np.asarray(whh[gi * h:(gi + 1) * h])   # (H, H)
            b = np.asarray(bih[gi * h:(gi + 1) * h]) + np.asarray(
                bhh[gi * h:(gi + 1) * h])
            gates[f"i{g}"] = {"kernel": np.ascontiguousarray(wi.T)}
            gates[f"h{g}"] = {"kernel": np.ascontiguousarray(wh.T), "bias": b}
        params[f"lstm{k}"] = gates
        k += 1
    params["projection"] = _dense(sd, "projection")
    return {"params": params}
