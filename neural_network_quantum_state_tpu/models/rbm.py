"""Complex RBM ansatze: plain, translation-, spin-flip- and Z2(x)parity-symmetric.

Reference classes: spinhalf::{RBM, RBMTrSymm, RBMSfSymm} in
cpu/include/neural_quantum_state.hpp:25-132 (+impl :32-693) and the GPU-only
spinhalf::RBMZ2PrSymm in gpu/include/neural_quantum_state.cuh:107-146
(+impl_neural_quantum_state.cuh:542-744, kernels :1556-1618).

All expand to the generic log-cosh Work; closed-form gradients mirror the
reference's ``backward``/``*__GetGradientsOfParameters__`` and are verified
against jax.grad in tests/test_models.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.models.base import Machine, Params
from neural_network_quantum_state_tpu.ops.engine import Cache, Work
from neural_network_quantum_state_tpu.ops.logcosh import logcosh


def _circulant_expand(w_raw: jnp.ndarray, n: int) -> jnp.ndarray:
    """Expand per-filter rings w_raw (alpha, N) into W (N, alpha*N).

    wf[i, f*N+j] = w_raw[f, (i+j) % N]  (RBMTrSymm construct_weight_and_bias_,
    impl_neural_quantum_state.hpp:413-429; same for FFNNTrSymm :1060-1076).
    """
    idx = (jnp.arange(n)[:, None] + jnp.arange(n)[None, :]) % n  # (i, j)
    # (alpha, i, j) -> (i, alpha, j) -> (i, alpha*j)
    wf = w_raw[:, idx]  # (alpha, N, N)
    return jnp.transpose(wf, (1, 0, 2)).reshape(n, -1)


def _circulant_grad(t: jnp.ndarray, spins: jnp.ndarray) -> jnp.ndarray:
    """d/dw_raw[f,m] = sum_j t[k,f,j] * s[k, (N+m-j) % N] -> (K, alpha, N).

    t is any per-hidden factor reshaped (K, alpha, N); this is the
    symmetrized backward of RBMTrSymm (impl:489-512) / FFNNTrSymm (:1150+),
    a batched circular cross-correlation expressed as a gather + matmul so
    it lands on the MXU.
    """
    n = spins.shape[-1]
    gidx = (jnp.arange(n)[:, None] - jnp.arange(n)[None, :]) % n  # [m, j]
    sg = spins[:, gidx].astype(t.dtype)  # (K, N_m, N_j)
    return jnp.einsum("kfj,kmj->kfm", t, sg)


@dataclasses.dataclass(frozen=True)
class RBM(Machine):
    """Vanilla complex RBM: ln psi = sum_i a_i s_i + sum_j logcosh(b_j + W.s).

    variables_ layout: [w (N,M) row-major, a (N,), b (M,)]
    (impl_neural_quantum_state.hpp:54-58).
    """

    n_hiddens: int = 0

    @property
    def n_vars(self) -> int:
        n, m = self.n_inputs, self.n_hiddens
        return n * m + n + m

    @property
    def n_hidden(self) -> int:
        return self.n_hiddens

    def param_spec(self):
        n, m = self.n_inputs, self.n_hiddens
        return [("w", (n, m)), ("a", (n,)), ("b", (m,))]

    def init_params(self, key: jax.Array) -> Params:
        n, m = self.n_inputs, self.n_hiddens
        kw, kb = jax.random.split(key)
        # w ~ 0.1*N(0, 1/(N+M)); a = 0; b ~ 0.1*N(0, 1/M)   (impl:49-66)
        return {
            "w": self._normal(kw, (n, m), 0.1 * (1.0 / (n + m)) ** 0.5),
            "a": jnp.zeros((n,), self.dtype),
            "b": self._normal(kb, (m,), 0.1 * (1.0 / m) ** 0.5),
        }

    def make_work(self, params: Params) -> Work:
        return Work(w=params["w"], b=params["b"], a=params["a"], c=None)

    def grad_log(self, params: Params, cache: Cache) -> jnp.ndarray:
        k = cache.spins.shape[0]
        s = cache.spins.astype(self.dtype)  # (K, N)
        t = jnp.tanh(cache.y)  # (K, M)
        d_dw = s[:, :, None] * t[:, None, :]  # (K, N, M)
        return jnp.concatenate([d_dw.reshape(k, -1), s, t], axis=-1)


@dataclasses.dataclass(frozen=True)
class RBMTrSymm(Machine):
    """Translation-symmetric RBM (PBC): alpha filters, shared visible bias.

    variables_ layout: [w (alpha,N), a (1,), b (alpha,)]; H = alpha*N with
    hidden index h = f*N + j (impl_neural_quantum_state.hpp:371-561).
    """

    alpha: int = 1

    @property
    def n_vars(self) -> int:
        return self.alpha * self.n_inputs + 1 + self.alpha

    @property
    def n_hidden(self) -> int:
        return self.alpha * self.n_inputs

    def param_spec(self):
        return [("w", (self.alpha, self.n_inputs)), ("a", (1,)), ("b", (self.alpha,))]

    def init_params(self, key: jax.Array) -> Params:
        n, al = self.n_inputs, self.alpha
        kw, kb = jax.random.split(key)
        return {
            "w": self._normal(kw, (al, n), 0.1 * (1.0 / ((1 + al) * n)) ** 0.5),
            "a": jnp.zeros((1,), self.dtype),
            "b": self._normal(kb, (al,), 0.1 * (1.0 / (al * n)) ** 0.5),
        }

    def make_work(self, params: Params) -> Work:
        n, al = self.n_inputs, self.alpha
        wf = _circulant_expand(params["w"], n)
        bf = jnp.repeat(params["b"], n)  # bf[f*N+j] = b[f]
        af = jnp.broadcast_to(params["a"], (n,))
        return Work(w=wf, b=bf, a=af, c=None)

    def grad_log(self, params: Params, cache: Cache) -> jnp.ndarray:
        k, n, al = cache.spins.shape[0], self.n_inputs, self.alpha
        t = jnp.tanh(cache.y).reshape(k, al, n)
        d_dw = _circulant_grad(t, cache.spins)  # (K, alpha, N)
        d_da = jnp.sum(cache.spins, axis=-1, keepdims=True).astype(self.dtype)
        d_db = jnp.sum(t, axis=-1)  # (K, alpha)
        return jnp.concatenate([d_dw.reshape(k, -1), d_da, d_db], axis=-1)


@dataclasses.dataclass(frozen=True)
class RBMSfSymm(Machine):
    """Spin-flip (Z2) symmetric RBM: no biases at all, psi(s) = psi(-s).

    variables_ layout: [w (N, alpha*N) row-major]
    (impl_neural_quantum_state.hpp:565-693).
    """

    alpha: int = 1

    @property
    def n_vars(self) -> int:
        return self.alpha * self.n_inputs * self.n_inputs

    @property
    def n_hidden(self) -> int:
        return self.alpha * self.n_inputs

    def param_spec(self):
        return [("w", (self.n_inputs, self.alpha * self.n_inputs))]

    def init_params(self, key: jax.Array) -> Params:
        n, al = self.n_inputs, self.alpha
        return {"w": self._normal(key, (n, al * n), 0.1 * (1.0 / ((1 + al) * n)) ** 0.5)}

    def make_work(self, params: Params) -> Work:
        h = self.alpha * self.n_inputs
        return Work(w=params["w"], b=jnp.zeros((h,), self.dtype), a=None, c=None)

    def grad_log(self, params: Params, cache: Cache) -> jnp.ndarray:
        k = cache.spins.shape[0]
        s = cache.spins.astype(self.dtype)
        t = jnp.tanh(cache.y)  # (K, alpha*N)
        return (s[:, :, None] * t[:, None, :]).reshape(k, -1)


@dataclasses.dataclass(frozen=True)
class RBMZ2PrSymm(Machine):
    """Z2 (x) parity symmetric RBM for the OBC long-range Ising chain.

    Each of alpha filters expands into 4 hidden units (+w, -w, +reflected w,
    -reflected w; reflection i -> N-1-i). variables_ layout:
    [w (N,alpha) row-major, b (alpha,)]; H = 4*alpha with h = f*4 + j
    (gpu impl_neural_quantum_state.cuh:542-744, 1556-1618).
    """

    alpha: int = 1

    @property
    def n_vars(self) -> int:
        return self.n_inputs * self.alpha + self.alpha

    @property
    def n_hidden(self) -> int:
        return 4 * self.alpha

    def param_spec(self):
        return [("w", (self.n_inputs, self.alpha)), ("b", (self.alpha,))]

    def init_params(self, key: jax.Array) -> Params:
        n, al = self.n_inputs, self.alpha
        kw, kb = jax.random.split(key)
        return {
            "w": self._normal(kw, (n, al), 0.1 * (1.0 / (4 * al + n)) ** 0.5),
            "b": self._normal(kb, (al,), 0.1 * (1.0 / (4 * al)) ** 0.5),
        }

    def make_work(self, params: Params) -> Work:
        n, al = self.n_inputs, self.alpha
        w = params["w"]  # (N, alpha)
        wf = jnp.stack([w, -w, w[::-1, :], -w[::-1, :]], axis=-1)  # (N, alpha, 4)
        bf = jnp.broadcast_to(params["b"][:, None], (al, 4))
        return Work(w=wf.reshape(n, 4 * al), b=bf.reshape(4 * al), a=None, c=None)

    def grad_log(self, params: Params, cache: Cache) -> jnp.ndarray:
        k, al = cache.spins.shape[0], self.alpha
        s = cache.spins.astype(self.dtype)  # (K, N)
        t = jnp.tanh(cache.y).reshape(k, al, 4)
        d_dw = (t[:, :, 0] - t[:, :, 1])[:, None, :] * s[:, :, None] + (
            t[:, :, 2] - t[:, :, 3]
        )[:, None, :] * s[:, ::-1, None]  # (K, N, alpha)
        d_db = jnp.sum(t, axis=-1)  # (K, alpha)
        return jnp.concatenate([d_dw.reshape(k, -1), d_db], axis=-1)
