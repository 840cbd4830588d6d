"""Complex RBM ansatze: plain, translation-, spin-flip- and Z2(x)parity-symmetric.

Reference classes: spinhalf::{RBM, RBMTrSymm, RBMSfSymm} in
cpu/include/neural_quantum_state.hpp:25-132 (+impl :32-693) and the GPU-only
spinhalf::RBMZ2PrSymm in gpu/include/neural_quantum_state.cuh:107-146
(+impl_neural_quantum_state.cuh:542-744, kernels :1556-1618).

All expand to the generic log-cosh Work; closed-form gradients mirror the
reference's ``backward``/``*__GetGradientsOfParameters__`` and are verified
against autodiff in tests/test_models.py. All complex quantities are
split-complex ``C`` pairs (ops.cplx).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.models.base import Machine, Params
from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.engine import Cache, Work


def _circulant_expand(w_raw: C, n: int) -> C:
    """Expand per-filter rings w_raw (alpha, N) into W (N, alpha*N).

    wf[i, f*N+j] = w_raw[f, (i+j) % N]  (RBMTrSymm construct_weight_and_bias_,
    impl_neural_quantum_state.hpp:413-429; same for FFNNTrSymm :1060-1076).
    """
    idx = (jnp.arange(n)[:, None] + jnp.arange(n)[None, :]) % n  # (i, j)

    def one(plane):
        wf = plane[:, idx]  # (alpha, N, N)
        return jnp.transpose(wf, (1, 0, 2)).reshape(n, -1)

    return C(one(w_raw.re), one(w_raw.im))


def _circulant_grad(t: C, spins: jnp.ndarray) -> C:
    """d/dw_raw[f,m] = sum_j t[k,f,j] * s[k, (N+m-j) % N] -> C (K, alpha, N).

    t is any per-hidden factor reshaped (K, alpha, N); this is the
    symmetrized backward of RBMTrSymm (impl:489-512) / FFNNTrSymm, a batched
    circular cross-correlation expressed as a gather + matmul so it lands on
    the MXU. The spin factor is real, so it applies to each plane.
    """
    n = spins.shape[-1]
    gidx = (jnp.arange(n)[:, None] - jnp.arange(n)[None, :]) % n  # [m, j]
    sg = spins[:, gidx]  # (K, N_m, N_j) real
    return C(
        jnp.einsum("kfj,kmj->kfm", t.re, sg),
        jnp.einsum("kfj,kmj->kfm", t.im, sg),
    )


def _outer_rs(s: jnp.ndarray, t: C) -> C:
    """d_dw[k,i,j] = s[k,i] * t[k,j] (real spins x split factor)."""
    return C(s[:, :, None] * t.re[:, None, :], s[:, :, None] * t.im[:, None, :])


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
            "a": self._zeros((n,)),
            "b": self._normal(kb, (m,), 0.1 * (1.0 / m) ** 0.5),
        }

    def make_work(self, params: Params) -> Work:
        return Work(w=params["w"], b=params["b"], a=params["a"], c=None)

    def grad_log(self, params: Params, cache: Cache) -> C:
        k = cache.spins.shape[0]
        s = cache.spins  # (K, N) real
        t = cplx.ctanh(cache.y)  # (K, M)
        d_dw = _outer_rs(s, t)  # (K, N, M)
        d_da = C(s, jnp.zeros_like(s))
        return cplx.concat([d_dw.reshape(k, -1), d_da, t], axis=-1)

    # -- hidden-subset training (RBM::update_partial_variables /
    #    partial_backward, impl_neural_quantum_state.hpp:85-130, 206-231):
    #    layout [a (all N), b_J, w_{i,J} row-major over i] -----------------
    def grad_log_partial(self, params: Params, cache: Cache, hidden_nodes) -> C:
        nodes = jnp.asarray(hidden_nodes, jnp.int32)
        k = cache.spins.shape[0]
        s = cache.spins
        t = cplx.ctanh(cache.y[:, nodes])  # (K, |J|)
        d_da = C(s, jnp.zeros_like(s))
        d_dw = _outer_rs(s, t)  # (K, N, |J|)
        return cplx.concat([d_da, t, d_dw.reshape(k, -1)], axis=-1)

    def update_params_partial(self, params: Params, dx: C, lr: float, hidden_nodes) -> Params:
        nodes = jnp.asarray(hidden_nodes, jnp.int32)
        n, nj = self.n_inputs, len(hidden_nodes)
        da = dx[:n]
        db = dx[n : n + nj]
        dw = dx[n + nj :].reshape(n, nj)
        return {
            "a": params["a"] - da * lr,
            "b": C(params["b"].re.at[nodes].add(-lr * db.re), params["b"].im.at[nodes].add(-lr * db.im)),
            "w": C(
                params["w"].re.at[:, nodes].add(-lr * dw.re),
                params["w"].im.at[:, nodes].add(-lr * dw.im),
            ),
        }


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
            "a": self._zeros((1,)),
            "b": self._normal(kb, (al,), 0.1 * (1.0 / (al * n)) ** 0.5),
        }

    def make_work(self, params: Params) -> Work:
        n = self.n_inputs
        wf = _circulant_expand(params["w"], n)
        bf = cplx.repeat(params["b"], n)  # bf[f*N+j] = b[f]
        af = cplx.broadcast_to(params["a"], (n,))
        return Work(w=wf, b=bf, a=af, c=None)

    def grad_log(self, params: Params, cache: Cache) -> C:
        k, n, al = cache.spins.shape[0], self.n_inputs, self.alpha
        t = cplx.ctanh(cache.y).reshape(k, al, n)
        d_dw = _circulant_grad(t, cache.spins)  # (K, alpha, N)
        ssum = jnp.sum(cache.spins, axis=-1, keepdims=True)
        d_da = C(ssum, jnp.zeros_like(ssum))
        d_db = cplx.csum(t, axis=-1)  # (K, alpha)
        return cplx.concat([d_dw.reshape(k, -1), d_da, d_db], axis=-1)


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
        return Work(w=params["w"], b=self._zeros((h,)), a=None, c=None)

    def grad_log(self, params: Params, cache: Cache) -> C:
        k = cache.spins.shape[0]
        t = cplx.ctanh(cache.y)  # (K, alpha*N)
        return _outer_rs(cache.spins, t).reshape(k, -1)


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
        wf = cplx.stack([w, -w, w[::-1], -w[::-1]], axis=-1)  # (N, alpha, 4)
        bf = cplx.broadcast_to(C(params["b"].re[:, None], params["b"].im[:, None]), (al, 4))
        return Work(w=wf.reshape(n, 4 * al), b=bf.reshape(4 * al), a=None, c=None)

    def grad_log(self, params: Params, cache: Cache) -> C:
        k, al = cache.spins.shape[0], self.alpha
        s = cache.spins  # (K, N) real
        t = cplx.ctanh(cache.y).reshape(k, al, 4)
        d01 = t[:, :, 0] - t[:, :, 1]  # (K, alpha)
        d23 = t[:, :, 2] - t[:, :, 3]
        d_dw = C(
            d01.re[:, None, :] * s[:, :, None] + d23.re[:, None, :] * s[:, ::-1, None],
            d01.im[:, None, :] * s[:, :, None] + d23.im[:, None, :] * s[:, ::-1, None],
        )  # (K, N, alpha)
        d_db = cplx.csum(t, axis=-1)  # (K, alpha)
        return cplx.concat([d_dw.reshape(k, -1), d_db], axis=-1)
