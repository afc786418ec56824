"""Core NN primitives, re-designed for TPU/XLA.

The reference builds everything from Python loops over ``nn.ModuleList``s of
small ``nn.Linear``s (e.g. MMoE's expert loop, model/mmoe.py:71-75; per-task
towers, :91-99).  On TPU that shape of program produces many small matmuls.
Here every "list of K parallel layers" is a single *stacked* parameter
``[K, in, out]`` contracted with one einsum, so XLA lowers it to one large
(batched) MXU matmul.

Reference parity notes are cited per class.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .initializers import (
    eye_init,
    normal_init,
    torch_linear_bias_init,
    torch_linear_kernel_init,
    xavier_normal_init,
)

Dtype = jnp.dtype

# ---------------------------------------------------------------------------
# Cross-replica batch-norm axis.  Under the explicit-collective shard_map
# step (parallel/explicit_step.py) every module sees only its LOCAL batch
# shard; batch statistics must be reduced over the mapped 'data' axis to
# match single-device numerics (reference DomainBatchNorm/DNN BN compute
# whole-batch stats, model/utils.py:553-636).  Rather than threading an
# axis_name through every model constructor, the step body sets this
# context variable around its traced loss computation and every BatchNorm
# construction site reads it (nn.compact modules are built at trace time,
# so the value is baked into the traced program).  The GSPMD mesh path
# needs none of this — jnp.mean over a sharded batch is already global.
# ---------------------------------------------------------------------------

import contextlib
import contextvars

_BN_CROSS_REPLICA_AXIS: contextvars.ContextVar = contextvars.ContextVar(
    "bn_cross_replica_axis", default=None
)


@contextlib.contextmanager
def bn_cross_replica_axis(name: Optional[str]):
    """Trace-time context: BatchNorm layers reduce their batch statistics
    over the named mapped axis (lax.pmean) while active."""
    tok = _BN_CROSS_REPLICA_AXIS.set(name)
    try:
        yield
    finally:
        _BN_CROSS_REPLICA_AXIS.reset(tok)


def bn_axis() -> Optional[str]:
    return _BN_CROSS_REPLICA_AXIS.get()


# ---------------------------------------------------------------------------
# Dropout under explicit data-parallel shard_map (VERDICT r4 #6).
#
# Per-shard PRNG streams would decorrelate from the single-device program:
# flax's make_rng yields the SAME key on every shard (the state rng is
# replicated), so each shard drawing a [B_loc, ...] mask would apply the
# IDENTICAL mask to different examples — n_data-fold correlated dropout
# that diverges from the global-batch program.  Inside
# ``dropout_global_batch(axis, n_shards)``, ShardedDropout instead draws
# the mask for the GLOBAL [n*B_loc, ...] batch (threefry is counter-based,
# so the global draw is well-defined and identical on every shard) and
# slices its own shard's rows — bit-identical to the mask the unsharded
# program applies to those examples.  Mask-bit generation is replicated
# n-fold, but dropout masks are a trivial fraction of step FLOPs.
# ---------------------------------------------------------------------------

_DROPOUT_GLOBAL_BATCH: contextvars.ContextVar = contextvars.ContextVar(
    "dropout_global_batch", default=None
)


@contextlib.contextmanager
def dropout_global_batch(axis: Optional[str], n_shards: int = 1):
    """Trace-time context: ShardedDropout draws global-batch masks and
    slices this shard's rows (leading axis must be the batch axis)."""
    tok = _DROPOUT_GLOBAL_BATCH.set(
        (axis, n_shards) if axis is not None and n_shards > 1 else None
    )
    try:
        yield
    finally:
        _DROPOUT_GLOBAL_BATCH.reset(tok)


# ---------------------------------------------------------------------------
# Stochastic-gate noise warmup (round 5, VERDICT r4 #4).  The MTL
# protocol's patience-3 early stop races the hard-concrete gate noise:
# fresh u each step delays head takeoff past the patience window on some
# seeds (BASELINE.md "stochastic-gate caveat").  The Trainer's
# ``snr_gate_noise_warmup_epochs`` knob traces the first E epochs' step
# programs inside this context — SNRGate then uses the DETERMINISTIC
# midpoint gate (u = 0.5) at train time, so heads take off as in the
# deterministic mode, and the noise (with its dead-gate-revival and L0
# behavior) engages only after the warmup.  Trace-time constant, same
# pattern as bn_cross_replica_axis.
# ---------------------------------------------------------------------------

_GATE_NOISE_OFF: contextvars.ContextVar = contextvars.ContextVar(
    "gate_noise_off", default=False
)


@contextlib.contextmanager
def gate_noise_off(active: bool):
    tok = _GATE_NOISE_OFF.set(bool(active))
    try:
        yield
    finally:
        _GATE_NOISE_OFF.reset(tok)


def gate_noise_is_off() -> bool:
    return _GATE_NOISE_OFF.get()


class ShardedDropout(nn.Module):
    """nn.Dropout semantics (bernoulli keep mask, x / keep_prob), plus the
    global-batch mode above.  Reference: torch ``F.dropout`` inside DNN
    (model/utils.py:131)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        ctx = _DROPOUT_GLOBAL_BATCH.get()
        if ctx is None:
            mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
        else:
            axis, n = ctx
            b_loc = x.shape[0]
            mask_g = jax.random.bernoulli(
                rng, p=keep, shape=(n * b_loc,) + tuple(x.shape[1:])
            )
            mask = jax.lax.dynamic_slice_in_dim(
                mask_g, jax.lax.axis_index(axis) * b_loc, b_loc
            )
        return jax.lax.select(mask, x / keep, jnp.zeros_like(x))


def activation_fn(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Stateless activations (reference model/utils.py:10-37).

    ``prelu``/``dice`` carry parameters and are handled inside MLP.
    """
    if name is None or name == "" or (isinstance(name, str) and name.lower() == "linear"):
        return lambda x: x
    name = name.lower()
    if name == "relu":
        return jax.nn.relu
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise NotImplementedError(f"activation {name!r}")


class _PReLU(nn.Module):
    """torch nn.PReLU (init 0.25).  ``param_shape=(K, 1)`` inside a stacked
    [B, K, h] MLP gives each stack element its own alpha, matching the
    reference's one nn.PReLU per expert/task (its parameter is named
    ``weight`` there, so the reference's L2 filter includes it — see
    losses.l2_regularization)."""

    param_shape: Tuple[int, ...] = (1,)

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda k, s: 0.25 * jnp.ones(s), self.param_shape
        )
        return jnp.where(x >= 0, x, alpha * x)


class Dice(nn.Module):
    """Data-adaptive activation (DIN's Dice).  The reference *names* this
    activation (model/utils.py:27-29) but never defines the class — calling
    activation_layer('dice') there raises NameError.  Supplied here:
        p = sigmoid(batchnorm(x));  out = p * x + (1 - p) * alpha * x
    """

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        normed = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-8,
            use_bias=False,
            use_scale=False,
            axis_name=bn_axis(),
        )(x)
        p = jax.nn.sigmoid(normed)
        return p * x + (1.0 - p) * alpha * x


class MLP(nn.Module):
    """Multi-layer perceptron (reference ``DNN``, model/utils.py:92-161).

    kernel init normal(0, init_std) (reference :140-142); bias keeps torch's
    default U(+-1/sqrt(fan_in)).  BatchNorm before activation when
    ``use_bn`` (torch BatchNorm1d: momentum 0.1 -> flax momentum 0.9,
    eps 1e-5).
    """

    hidden_units: Sequence[int]
    activation: Optional[str] = "relu"
    dropout_rate: float = 0.0
    use_bn: bool = False
    init_std: float = 1e-4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if len(self.hidden_units) == 0:
            raise ValueError("hidden_units is empty!!")
        for i, units in enumerate(self.hidden_units):
            fan_in = x.shape[-1]
            x = nn.Dense(
                units,
                kernel_init=normal_init(self.init_std),
                bias_init=torch_linear_bias_init(fan_in),
                name=f"dense_{i}",
            )(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis_name=bn_axis(),
                    name=f"bn_{i}",
                )(x)
            if self.activation is not None and self.activation != "":
                if self.activation.lower() == "prelu":
                    x = _PReLU(name=f"prelu_{i}")(x)
                elif self.activation.lower() == "dice":
                    x = Dice(name=f"dice_{i}")(x, train=train)
                else:
                    x = activation_fn(self.activation)(x)
            if self.dropout_rate > 0:
                x = ShardedDropout(rate=self.dropout_rate)(x, deterministic=not train)
        return x


class StackedDense(nn.Module):
    """K parallel Dense layers as one einsum.

    Input [B, in] (broadcast to every stack member) or [B, K, in]
    (per-member input).  Output [B, K, out].

    Replaces the reference's ``nn.ModuleList([nn.Linear(...)] * K)`` pattern
    (e.g. model/mmoe.py:39-41, :52-55).  ``kernel_init`` defaults to the
    torch nn.Linear default since the reference does not re-init these.
    """

    stack: int
    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kinit = self.kernel_init or torch_linear_kernel_init()
        kernel = self.param("kernel", kinit, (self.stack, in_dim, self.features))
        if x.ndim == 2:
            y = jnp.einsum("bi,kio->bko", x, kernel)
        elif x.ndim == 3:
            y = jnp.einsum("bki,kio->bko", x, kernel)
        else:
            raise ValueError(f"StackedDense expects rank 2/3 input, got {x.shape}")
        if self.use_bias:
            binit = self.bias_init or torch_linear_bias_init(in_dim)
            bias = self.param("bias", binit, (self.stack, self.features))
            y = y + bias[None]
        return y


class StackedMLP(nn.Module):
    """K parallel MLPs (reference: lists of ``DNN``s, e.g. MMoE experts
    model/mmoe.py:27-29) as stacked einsums.

    BatchNorm statistics are per (stack, feature) pair, matching K
    independent ``BatchNorm1d``s.
    """

    stack: int
    hidden_units: Sequence[int]
    activation: Optional[str] = "relu"
    dropout_rate: float = 0.0
    use_bn: bool = False
    init_std: float = 1e-4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if len(self.hidden_units) == 0:
            raise ValueError("hidden_units is empty!!")
        for i, units in enumerate(self.hidden_units):
            fan_in = x.shape[-1]
            x = StackedDense(
                stack=self.stack,
                features=units,
                kernel_init=normal_init(self.init_std),
                bias_init=torch_linear_bias_init(fan_in),
                name=f"dense_{i}",
            )(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis=(-2, -1),
                    axis_name=bn_axis(),
                    name=f"bn_{i}",
                )(x)
            if self.activation is not None and self.activation != "":
                if self.activation.lower() == "prelu":
                    # per-stack alpha, like the reference's one PReLU per
                    # expert/task module
                    x = _PReLU(param_shape=(self.stack, 1), name=f"prelu_{i}")(x)
                elif self.activation.lower() == "dice":
                    x = Dice(name=f"dice_{i}")(x, train=train)
                else:
                    x = activation_fn(self.activation)(x)
            if self.dropout_rate > 0:
                x = ShardedDropout(rate=self.dropout_rate)(x, deterministic=not train)
        return x


class PredictionHeads(nn.Module):
    """Per-task output layer (reference ``PredictionLayer``,
    model/utils.py:225-248, instantiated per task as ``self.out``).

    Takes logits [B, T]; adds a learned scalar bias per task (init zero) and
    applies sigmoid to binary heads.
    """

    task_types: Tuple[str, ...]

    @nn.compact
    def __call__(self, logits):
        T = logits.shape[-1]
        assert T == len(self.task_types), (T, self.task_types)
        bias = self.param("bias", nn.initializers.zeros, (T,))
        out = logits + bias[None]
        is_binary = jnp.asarray(
            [1.0 if t == "binary" else 0.0 for t in self.task_types], out.dtype
        )
        return is_binary * jax.nn.sigmoid(out) + (1.0 - is_binary) * out


class WideLinear(nn.Module):
    """LR-style wide/linear logit (reference ``Linear``, basemodel.py:14-66).

    Per-sparse-feature 1-dim embeddings summed + dense values through a
    single [Dd, 1] weight -> [B, 1] logit.  In the reference this module is
    constructed in every model but NEVER invoked in any forward (and every
    model passes ``linear_feature_columns=[]``, e.g. model/mmoe.py:10), so
    it has zero runtime effect there.  Here it is the opt-in inventory
    close-out: ``model_config.use_wide_linear: true`` adds this logit to
    every head pre-sigmoid (the standard wide&deep composition the dead
    code was clearly intended for).  Varlen features are not supported
    (the reference's ``ctrdataset`` never produces one, SURVEY §2.4.6).

    One fused [total_vocab, 1] table instead of the reference's per-feature
    ``nn.Embedding(vocab, 1)`` dict — same init (normal, std init_std),
    same math (sum over features of the gathered scalars).  The reference
    keys its linear embedding dict by ``embedding_name`` (model/utils.py:
    466-488 with linear=True), so features SHARING a name share one wide
    table there; ``slot_tables[i]`` maps sparse slot i to its (deduped)
    table index to reproduce that sharing.  ``slot_cols[i]`` is slot i's
    column in the packed ids array.
    """

    vocab_sizes: Tuple[int, ...]  # one entry per UNIQUE embedding_name
    n_dense: int
    init_std: float = 1e-4
    slot_tables: Optional[Tuple[int, ...]] = None  # default: identity
    slot_cols: Optional[Tuple[int, ...]] = None  # default: leading columns

    @nn.compact
    def __call__(self, ids: jnp.ndarray, dense: Optional[jnp.ndarray]) -> jnp.ndarray:
        B = ids.shape[0] if ids is not None else dense.shape[0]
        logit = jnp.zeros((B, 1), jnp.float32)
        if self.vocab_sizes:
            slot_tables = np.asarray(
                self.slot_tables
                if self.slot_tables is not None
                else np.arange(len(self.vocab_sizes))
            )
            slot_cols = np.asarray(
                self.slot_cols
                if self.slot_cols is not None
                else np.arange(len(slot_tables))
            )
            offsets = np.concatenate([[0], np.cumsum(self.vocab_sizes)[:-1]])
            table = self.param(
                "table",
                normal_init(self.init_std),
                (int(sum(self.vocab_sizes)), 1),
            )
            flat = ids[:, slot_cols] + jnp.asarray(
                offsets[slot_tables], jnp.int32
            )[None, :]
            # [B, F] gathered scalars summed over features
            logit = logit + jnp.sum(jnp.take(table[:, 0], flat, axis=0),
                                    axis=1, keepdims=True)
        if self.n_dense:
            kernel = self.param(
                "kernel", normal_init(self.init_std), (self.n_dense, 1)
            )
            logit = logit + dense[:, : self.n_dense] @ kernel
        return logit


class CrossStitchLayer(nn.Module):
    """Learned (sum(D_i) x sum(D_i)) mixing matrix, identity-init
    (reference model/cross_stitch.py:7-27).  Input/output [B, T, F]."""

    @nn.compact
    def __call__(self, x):
        b, t, f = x.shape
        w = self.param("cross_stitch_weight", eye_init(), (t * f, t * f))
        mixed = jnp.reshape(x, (b, t * f)) @ w
        return jnp.reshape(mixed, (b, t, f))


class SharedSpecificDense(nn.Module):
    """STAR's shared (x) specific FCN layer (reference
    ``SharedSpecificLinear``, model/utils.py:163-223).

    effective_weight[d] = specific[d] * shared ; effective_bias[d] =
    specific_bias[d] + shared_bias.  Computes ALL domains at once:
    [B, in] -> [B, D, out] or [B, D, in] -> [B, D, out].

    Unlike the reference — whose per-domain weights live in plain Python
    lists so only the last domain's tensors are registered/trained
    (model/utils.py:181-191, SURVEY §2.4.2) — all domain parameters here are
    proper pytree leaves.  ``freeze_ref_faithful`` reproduces the reference
    bug by stopping gradients through domains 0..D-2.
    """

    num_domains: int
    features: int
    use_shared: bool = True
    use_bias: bool = True
    freeze_ref_faithful: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        # torch kaiming_uniform(a=sqrt(5)) on an (in,out) tensor uses torch's
        # fan_in == out_features; we use the conventional 1/sqrt(in).
        kinit = torch_linear_kernel_init()
        binit = torch_linear_bias_init(in_dim)
        spec_w = self.param("specific_kernel", kinit, (self.num_domains, in_dim, self.features))
        spec_b = (
            self.param("specific_bias", binit, (self.num_domains, self.features))
            if self.use_bias
            else None
        )
        if self.freeze_ref_faithful and self.num_domains > 1:
            frozen = jax.lax.stop_gradient(spec_w[: self.num_domains - 1])
            spec_w = jnp.concatenate([frozen, spec_w[self.num_domains - 1 :]], axis=0)
            if spec_b is not None:
                frozen_b = jax.lax.stop_gradient(spec_b[: self.num_domains - 1])
                spec_b = jnp.concatenate([frozen_b, spec_b[self.num_domains - 1 :]], axis=0)
        if self.use_shared:
            shared_w = self.param("shared_kernel", kinit, (in_dim, self.features))
            weight = spec_w * shared_w[None]
        else:
            weight = spec_w
        if x.ndim == 2:
            y = jnp.einsum("bi,dio->bdo", x, weight)
        else:
            y = jnp.einsum("bdi,dio->bdo", x, weight)
        if self.use_bias:
            bias = spec_b
            if self.use_shared:
                shared_b = self.param("shared_bias", binit, (self.features,))
                bias = bias + shared_b[None]
            y = y + bias[None]
        return y


class GateNN(nn.Module):
    """PEPNet gate: Linear -> (BN) -> act -> (dropout) -> Linear -> 2*sigmoid
    (reference model/pepnet.py:8-32)."""

    output_dim: int
    hidden_dim: Optional[int] = None
    hidden_activation: str = "relu"
    dropout_rate: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        hidden = self.hidden_dim or self.output_dim
        fan_in = x.shape[-1]
        x = nn.Dense(
            hidden,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(fan_in),
            name="dense_0",
        )(x)
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=bn_axis(),
            )(x)
        x = activation_fn(self.hidden_activation)(x)
        if self.dropout_rate > 0:
            x = ShardedDropout(rate=self.dropout_rate)(x, deterministic=not train)
        x = nn.Dense(
            self.output_dim,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(hidden),
            name="dense_1",
        )(x)
        return 2.0 * jax.nn.sigmoid(x)


class SNRGate(nn.Module):
    """SNR / MSSM routing layer (reference model/snr_trans.py:9-50 and
    model/mssm.py:9-59).

    Per (output j, input i) connection: a learned ``units x units`` transform
    scaled by a hard-concrete-style gate
        z = clip(sigmoid(log u - log(1-u) + log(alpha)/beta) * (eps - gamma)
                 + gamma, 0, 1)
    with beta=0.9, gamma=-0.1, eps=1.1.  ``elementwise=False`` -> SNR (scalar
    z per connection, u shaped [out, in]); ``elementwise=True`` -> MSSM
    (z per feature, u shaped [out, in, units]).

    Input [B, in, units] -> output [B, out, units] via one einsum (the
    reference loops over out x in with per-pair matmuls,
    model/snr_trans.py:45-50).

    ``freeze_*_ref_faithful`` reproduce the reference's unregistered-param
    bugs (SURVEY §2.4.2): SNR registers alpha+u but not trans_matrix; MSSM
    registers only alpha.
    """

    input_dim: int
    output_dim: int
    units: int
    elementwise: bool = False
    beta: float = 0.9
    gamma: float = -0.1
    epsilon: float = 1.1
    e: float = 1e-8
    freeze_trans_ref_faithful: bool = False
    freeze_u_ref_faithful: bool = False
    # True = re-draw u per training step (the hard-concrete noise the
    # reference's authors left COMMENTED OUT, mssm.py:40 / snr_trans.py:39;
    # enabled via model_config ``snr_stochastic_gates``).  Prevents the
    # dead-head pathology of the deterministic gate: an init draw can gate
    # every connection into a head to exactly z = 0, where the clip's zero
    # gradient makes it unrecoverable (diagnosed in BASELINE.md, snr seed
    # 5).  Stochastic u keeps z varying so alpha still receives gradient;
    # eval uses the distribution midpoint (u = 0.5, the standard
    # hard-concrete deterministic test gate).
    stochastic: bool = False
    # True = the hard-concrete location alpha is PER-CONNECTION (shaped like
    # u) instead of the reference's single scalar (snr_trans.py:13
    # ``torch.rand(1)``).  With ``stochastic`` the scalar variant degrades
    # into drop-connect noise with one global learnable rate — u is fresh
    # noise each step, so no per-connection routing signal exists and the
    # slow-takeoff heads die under tight early stopping (BASELINE.md
    # "stochastic-gate caveat").  Per-connection alpha is the standard
    # Louizos et al. L0 hard-concrete parameterization: each connection's
    # keep-rate is learned while the noise keeps clipped gates alive.
    # Enabled via model_config ``snr_gate_alpha: "per_connection"``.
    per_connection_alpha: bool = False
    # Non-None = initialize alpha to this CONSTANT instead of U(0, 1)
    # (model_config ``snr_gate_open_init``).  The reference's torch.rand
    # init puts the mean midpoint gate at z ~ 0.45 with ~11% of
    # connections born exactly CLOSED (z = 0, zero clip gradient) — on
    # MTL that halves the slow head's signal and its takeoff loses the
    # patience-3 early-stop race even with deterministic gates (round-5
    # warmup experiments, BASELINE.md).  The standard Louizos et al. L0
    # practice initializes the keep-rate HIGH; alpha >= ~8.7 opens every
    # midpoint gate fully (z = 1 needs sigmoid(log a / beta) >= 11/12),
    # so training starts at the no-gates ceiling and the L0 machinery
    # prunes from there as alpha learns.
    open_init_alpha: Optional[float] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert x.ndim == 3 and x.shape[1] == self.input_dim and x.shape[2] == self.units
        alpha_shape = (
            (self.output_dim, self.input_dim, self.units)
            if self.elementwise
            else (self.output_dim, self.input_dim)
        ) if self.per_connection_alpha else (1,)
        if self.open_init_alpha is not None:
            a0 = float(self.open_init_alpha)
            alpha = self.param(
                "alpha", lambda k, s: jnp.full(s, a0, jnp.float32),
                alpha_shape,
            )  # open-gate init (see open_init_alpha above)
        else:
            alpha = self.param(
                "alpha", lambda k, s: jax.random.uniform(k, s), alpha_shape
            )  # torch.rand init (snr_trans.py:13); uniform per connection
            # keeps the init-time z distribution identical to the scalar
            # variant
        u_shape = (
            (self.output_dim, self.input_dim, self.units)
            if self.elementwise
            else (self.output_dim, self.input_dim)
        )
        if self.stochastic:
            if train and not gate_noise_is_off():
                u = jax.random.uniform(
                    self.make_rng("dropout"), u_shape, jnp.float32,
                    self.e, 1.0 - 2.0 ** -20,
                )
            else:
                # eval midpoint gate; also the TRAIN gate during the
                # gate-noise warmup epochs (gate_noise_off above)
                u = jnp.full(u_shape, 0.5, jnp.float32)
        else:
            u = self.param(
                "u",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, self.e, 1.0 - self.e),
                u_shape,
            )
        trans = self.param(
            "trans",
            xavier_normal_init(),
            (self.output_dim, self.input_dim, self.units, self.units),
        )
        if self.freeze_u_ref_faithful and not self.stochastic:
            u = jax.lax.stop_gradient(u)
        if self.freeze_trans_ref_faithful:
            trans = jax.lax.stop_gradient(trans)

        # clamp: alpha is trainable and unconstrained; log(alpha<=0) would
        # NaN (the reference would NaN identically at snr_trans.py:40 —
        # u/alpha are registered params there).  Per-connection alpha
        # broadcasts against u ([out, in] or [out, in, units]).
        alpha_safe = jnp.maximum(
            alpha if self.per_connection_alpha else alpha[0], 1e-8)
        # f32-safe strict interior for u: ``1.0 - 1e-8`` rounds to exactly
        # 1.0 in f32 (eps ~1.2e-7), which made the upper clip a no-op —
        # once adam pushed a trained u past 1, log1p(-u_safe) hit -inf and
        # its clip-masked gradient became 0 * -inf = NaN, poisoning every
        # parameter within a step (caught by the full-protocol parity
        # suite: mssm seeds 1 and 5; the reference never trips this only
        # because its u is FROZEN by the unregistered-param bug,
        # mssm.py:26-36).  1 - 2^-20 is exactly representable; z saturates
        # to 1.0 well before this region (s >= ~0.917 suffices), so
        # in-range numerics are unchanged.
        u_safe = jnp.clip(u, self.e, 1.0 - 2.0 ** -20)
        s = jax.nn.sigmoid(
            jnp.log(u_safe) - jnp.log1p(-u_safe) + jnp.log(alpha_safe) / self.beta
        )
        s_ = s * (self.epsilon - self.gamma) + self.gamma
        z = jnp.clip(s_, 0.0, 1.0)

        if self.elementwise:
            # z: [out, in, units] gates the *output* features: fold over v.
            tz = trans * z[:, :, None, :]
        else:
            tz = trans * z[:, :, None, None]
        return jnp.einsum("bju,ijuv->biv", x, tz)


class AITMAttention(nn.Module):
    """AITM's 2-token single-head attention transfer
    (reference model/aitm.py:44-49, 85-94)."""

    dim: int

    @nn.compact
    def __call__(self, p, q):
        # p: transferred info from previous task [B, F]; q: own feature [B, F]
        x = jnp.stack([p, q], axis=1)  # [B, 2, F]
        dense = lambda name: nn.Dense(
            self.dim,
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(self.dim),
            name=name,
        )
        V = dense("h1")(x)
        K = dense("h2")(x)
        Q = dense("h3")(x)
        att = jax.nn.softmax(
            jnp.sum(K * Q, axis=2, keepdims=True) / jnp.sqrt(float(self.dim)), axis=1
        )
        return jnp.sum(att * V, axis=1)


def sequence_pooling(seq_emb, mask, mode: str = "mean", eps: float = 1e-8):
    """Masked pooling over a behaviour sequence (reference
    ``SequencePoolingLayer``, model/utils.py:258-326).

    seq_emb: [B, T, E]; mask: [B, T] (1 = valid). Returns [B, E].
    """
    mask = mask.astype(seq_emb.dtype)
    if mode == "max":
        hist = seq_emb - (1.0 - mask[..., None]) * 1e9
        return jnp.max(hist, axis=1)
    summed = jnp.sum(seq_emb * mask[..., None], axis=1)
    if mode == "sum":
        return summed
    if mode == "mean":
        lengths = jnp.sum(mask, axis=1, keepdims=True)
        return summed / (lengths + eps)
    raise ValueError(f"pooling mode {mode!r} must be sum/mean/max")
