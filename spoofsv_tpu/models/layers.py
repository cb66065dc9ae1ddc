"""Core network blocks: gated highway convolutions with incremental decoding.

TPU-native re-design of the reference's DCTTS building blocks
(``models/TTSModel.py:37-104``):

  * layout is time-major ``(B, T, C)`` so channels land on TPU lanes and all
    1×1 convs become lane-aligned ``Dense`` matmuls on the MXU;
  * every block with temporal state exposes BOTH a full-sequence ``__call__``
    (teacher-forced training — one big parallel conv) and a single-frame
    ``step`` with an explicit ring-buffer cache, so autoregressive decoding is
    a ``lax.scan`` of O(T) cached steps instead of the reference's O(T²)
    full-prefix recompute (``synthesize.py:104-109``);
  * parameters are Kaiming-normal initialized to match the reference's
    ``init_weights`` (``train/ordinary.py:16-19``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Kaiming He normal, fan_in, as torch.nn.init.kaiming_normal_(nonlinearity='relu')
KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

# torch.nn.LayerNorm default epsilon
LN_EPS = 1e-5

Array = jax.Array

# Full-sequence highway-block implementation: "xla" (plain jnp, XLA fuses),
# "pallas" (ops.pallas_ops.fused_highway_gate — LN/σ/blend in one VMEM pass),
# or "fused_conv" (ops.pallas_conv.fused_highway_conv — the WHOLE block
# including the conv: the 2C-wide pre-activation never touches HBM; wins
# 11–21 % on every isolated SSRN block but loses ~16 % at full-module scale,
# so it is opt-in, not a default — docs/SSRN_PROFILE.json).
# Process-wide default, resolved at trace time; set it once at startup
# (before any jit trace) via set_default_gate_impl — the CLIs apply
# cfg.tpu.highway_gate_impl for training and cfg.tpu.highway_infer_impl for
# the inference subcommands (the fused forward pairs with a recompute-style
# custom_vjp, the right trade for inference but not for the train step).
_DEFAULT_GATE_IMPL = "xla"


def set_default_gate_impl(impl: str) -> None:
    global _DEFAULT_GATE_IMPL
    assert impl in ("xla", "pallas", "fused_conv", "fused_pair"), impl
    _DEFAULT_GATE_IMPL = impl


def highway_pair(a: "HighwayConv", b: "HighwayConv", x: Array,
                 deterministic: bool = True) -> Array:
    """Apply two consecutive highway blocks, fusing them into ONE pallas
    dispatch when the process-wide impl is ``"fused_pair"`` (the
    two-layer-per-dispatch design from docs/NEXT.md: the inter-layer
    activation stays in VMEM and the dispatch-boundary count halves — the
    lever the single-block fusion's module-level inversion pointed at,
    docs/SSRN_PROFILE.json). Falls back to sequential block calls at init,
    for mismatched shapes/causality, when a training-mode dropout sits
    between the blocks (fusion would skip it), or when the combined conv
    halo doesn't fit the tile."""
    impl = a.gate_impl or _DEFAULT_GATE_IMPL
    if impl == "fused_pair" and not a.is_initializing() and x.ndim == 3:
        span_a = a.dilation * (a.kernel_size - 1)
        span_b = b.dilation * (b.kernel_size - 1)
        block_t = min(256, max(8, x.shape[1]))
        pa_l = span_a if a.causal else span_a // 2
        pb_l = span_b if b.causal else span_b // 2
        fusable = (
            a.dim == b.dim and a.causal == b.causal
            and a.kernel_size == b.kernel_size
            and (deterministic or (a.dropout_rate == 0.0
                                   and b.dropout_rate == 0.0))
            and pa_l + pb_l <= block_t
            and (span_a - pa_l) + (span_b - pb_l) <= block_t)
        if fusable:
            from spoofsv_tpu.ops.pallas_conv import fused_highway_conv_pair_ad

            dt = a.dtype
            pca = a.conv.variables["params"]
            p1a = a.ln1.variables["params"]
            p2a = a.ln2.variables["params"]
            pcb = b.conv.variables["params"]
            p1b = b.ln1.variables["params"]
            p2b = b.ln2.variables["params"]
            out = fused_highway_conv_pair_ad(
                x.astype(dt),
                pca["kernel"].astype(dt), pca["bias"],
                p1a["scale"], p1a["bias"], p2a["scale"], p2a["bias"],
                pcb["kernel"].astype(dt), pcb["bias"],
                p1b["scale"], p1b["bias"], p2b["scale"], p2b["bias"],
                a.dilation, b.dilation, a.causal)
            out = functional_dropout(a, out, a.dropout_rate, deterministic)
            return functional_dropout(b, out, b.dropout_rate, deterministic)
    return b(a(x, deterministic), deterministic)


def functional_dropout(module: nn.Module, x: Array, rate: float,
                       deterministic: bool) -> Array:
    """Dropout for setup-style modules (flax forbids constructing nn.Dropout
    submodules inside plain methods)."""
    if deterministic or rate <= 0.0:
        return x
    rng = module.make_rng("dropout")
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


class HighwayConv(nn.Module):
    """Gated ("highway") 1-D convolution (``models/TTSModel.py:37-84``).

    ``y = σ(LN1(h1)) * LN2(h2) + (1-σ(LN1(h1))) * x`` where ``[h1, h2]`` is a
    width-``2*dim`` conv of the input. Causal variant left-pads
    ``dilation*(kernel_size-1)`` zeros (``models/TTSModel.py:72-74``).
    """

    dim: int
    kernel_size: int = 3
    dilation: int = 1
    causal: bool = False
    dropout_rate: float = 0.0       # dropout variant: TTSModel_dropout.py:62,85
    dtype: Any = jnp.float32
    gate_impl: Optional[str] = None   # None → module default (set_default_gate_impl)

    @property
    def pad(self) -> int:
        return self.dilation * (self.kernel_size - 1)

    def setup(self):
        self.conv = nn.Conv(
            2 * self.dim, (self.kernel_size,), kernel_dilation=(self.dilation,),
            padding="VALID" if self.causal else "SAME",
            kernel_init=KAIMING, dtype=self.dtype, name="conv")
        self.ln1 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln1")
        self.ln2 = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln2")

    def _gate(self, h: Array, x: Array) -> Array:
        h1, h2 = jnp.split(h, 2, axis=-1)
        h1 = self.ln1(h1)
        h2 = self.ln2(h2)
        g = jax.nn.sigmoid(h1)
        return g * h2 + (1.0 - g) * x

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        """Full-sequence forward; ``x``: (B, T, C)."""
        impl = self.gate_impl or _DEFAULT_GATE_IMPL
        if (impl in ("fused_conv", "fused_pair") and not self.is_initializing()
                and x.ndim == 3 and self.pad <= min(256, x.shape[1])):
            # "fused_pair" blocks that reach here individually (no partner
            # at the call site, or the pair was unfusable) still run the
            # single-block whole-conv fusion.
            # Whole-block Pallas fusion (ops/pallas_conv.py): conv + LN1/LN2
            # + σ gate + residual in one VMEM pass — the 2C pre-activation
            # never reaches HBM. Falls through to the plain path for inputs
            # too short to carry the conv's halo (pad > min(block, T)), at
            # init (params must be created by the flax submodules), and in
            # ``step`` (single frames don't amortize a pallas dispatch).
            from spoofsv_tpu.ops.pallas_conv import fused_highway_conv_ad

            pc = self.conv.variables["params"]
            p1 = self.ln1.variables["params"]
            p2 = self.ln2.variables["params"]
            dt = self.dtype
            out = fused_highway_conv_ad(
                x.astype(dt), pc["kernel"].astype(dt), pc["bias"],
                p1["scale"], p1["bias"], p2["scale"], p2["bias"],
                self.dilation, self.causal)
            return functional_dropout(self, out, self.dropout_rate,
                                      deterministic)
        inp = x
        if self.causal and self.pad > 0:
            inp = jnp.pad(x, ((0, 0), (self.pad, 0), (0, 0)))
        h = self.conv(inp)
        if impl == "pallas" and not self.is_initializing():
            # One VMEM-resident pass for LN1/LN2/σ/blend instead of the XLA
            # elementwise chain; init still runs the plain path so the LN
            # params are created. Single-frame ``step`` keeps the plain path
            # (tiny rows don't amortize a pallas dispatch inside the scan).
            from spoofsv_tpu.ops.pallas_ops import fused_highway_gate_ad

            p1 = self.ln1.variables["params"]
            p2 = self.ln2.variables["params"]
            out = fused_highway_gate_ad(h, x, p1["scale"], p1["bias"],
                                        p2["scale"], p2["bias"])
        else:
            out = self._gate(h, x)
        out = functional_dropout(self, out, self.dropout_rate, deterministic)
        return out

    # -- incremental decoding ------------------------------------------------
    def init_cache(self, batch: int, dtype=None) -> Array:
        """Ring buffer of the last ``pad`` inputs; zeros == left zero-padding."""
        assert self.causal, "cache only makes sense for causal convs"
        return jnp.zeros((batch, max(self.pad, 1), self.dim), dtype or self.dtype)

    def step(self, x_t: Array, cache: Array) -> Tuple[Array, Array]:
        """One causal step; ``x_t``: (B, C), cache: (B, pad, C) of past inputs.

        Equivalent to the last output column of ``__call__`` on the full prefix
        (verified by the step-vs-full and torch AR-loop parity tests). The k
        taps are concatenated into one (B, k·C) row so the whole conv is a
        single wider matmul — k× fewer, larger MXU ops per decode step.
        """
        kernel = self.conv.variables["params"]["kernel"]  # (k, C, 2C)
        bias = self.conv.variables["params"]["bias"]
        k = self.kernel_size
        taps = [cache[:, i * self.dilation, :] for i in range(k - 1)] + [x_t]
        stacked = jnp.concatenate(taps, axis=-1).astype(self.dtype)  # (B, k*C)
        w = kernel.astype(self.dtype).reshape(k * self.dim, 2 * self.dim)
        h = jnp.dot(stacked, w) + bias
        out = self._gate(h, x_t)
        if self.pad > 0:
            cache = jnp.concatenate([cache[:, 1:, :], x_t[:, None, :]], axis=1)
        return out, cache


class HighwayDilationStack(nn.Module):
    """Four stacked k=3 highway convs, dilations 1/3/9/27
    (``models/TTSModel.py:86-104``)."""

    dim: int
    causal: bool = False
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.blocks = [
            HighwayConv(self.dim, 3, d, self.causal, self.dropout_rate, self.dtype,
                        name=f"hc{i+1}")
            for i, d in enumerate((1, 3, 9, 27))
        ]

    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        # under "fused_pair" the (1,3) and (9,27) blocks fuse two-by-two
        x = highway_pair(self.blocks[0], self.blocks[1], x, deterministic)
        return highway_pair(self.blocks[2], self.blocks[3], x, deterministic)

    def init_cache(self, batch: int, dtype=None):
        return tuple(b.init_cache(batch, dtype) for b in self.blocks)

    def step(self, x_t: Array, caches) -> Tuple[Array, Tuple]:
        new = []
        for blk, c in zip(self.blocks, caches):
            x_t, c2 = blk.step(x_t, c)
            new.append(c2)
        return x_t, tuple(new)


class LNDense(nn.Module):
    """Dense (≡ k=1 conv in (B,T,C) layout) followed by LayerNorm — the
    reference's ``conv(k=1) → LayerNorm`` idiom (e.g. ``models/TTSModel.py:115-118``)."""

    features: int
    dtype: Any = jnp.float32
    use_ln: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.features, kernel_init=KAIMING, dtype=self.dtype, name="dense")(x)
        if self.use_ln:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln")(x)
        return x
