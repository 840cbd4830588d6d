"""Complex one-hidden-layer FFNN ansatze: plain, translation- and spin-flip-symmetric.

ln psi = sum_j w1o_j * logcosh(b1_j + sum_i wi1_ij s_i)

Reference classes: spinhalf::{FFNN, FFNNTrSymm, FFNNSfSymm},
cpu/include/neural_quantum_state.hpp:142-247 (+impl :698-1348).
In the generic log-cosh Work the output weights become ``c`` and there is no
visible bias term. All complex quantities are split-complex ``C`` pairs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from neural_network_quantum_state_tpu.models.base import Machine, Params
from neural_network_quantum_state_tpu.models.rbm import _circulant_expand, _circulant_grad, _outer_rs
from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.engine import Cache, Work


@dataclasses.dataclass(frozen=True)
class FFNN(Machine):
    """variables_ layout: [wi1 (N,M) row-major, b1 (M,), w1o (M,)]
    (impl_neural_quantum_state.hpp:720-732). Init: real plane ~ N(0,1/fan),
    imag plane ~ 0.1*N(0,1/fan) (:729-732)."""

    n_hiddens: int = 0

    @property
    def n_vars(self) -> int:
        return self.n_inputs * self.n_hiddens + 2 * self.n_hiddens

    @property
    def n_hidden(self) -> int:
        return self.n_hiddens

    def param_spec(self):
        n, m = self.n_inputs, self.n_hiddens
        return [("wi1", (n, m)), ("b1", (m,)), ("w1o", (m,))]

    def init_params(self, key: jax.Array) -> Params:
        n, m = self.n_inputs, self.n_hiddens
        k1, k2, k3 = jax.random.split(key, 3)
        sw, sb = (1.0 / (n + m)) ** 0.5, (1.0 / m) ** 0.5
        return {
            "wi1": self._normal(k1, (n, m), sw, imag_scale=0.1 * sw),
            "b1": self._normal(k2, (m,), sb, imag_scale=0.1 * sb),
            "w1o": self._normal(k3, (m,), sb, imag_scale=0.1 * sb),
        }

    def make_work(self, params: Params) -> Work:
        return Work(w=params["wi1"], b=params["b1"], a=None, c=params["w1o"])

    def grad_log(self, params: Params, cache: Cache) -> C:
        k = cache.spins.shape[0]
        t = cplx.ctanh(cache.y) * params["w1o"]  # (K, M)
        d_dwi1 = _outer_rs(cache.spins, t)
        d_dw1o = cplx.clogcosh(cache.y)
        return cplx.concat([d_dwi1.reshape(k, -1), t, d_dw1o], axis=-1)

    # -- hidden-subset training (reference FFNN::partial_backward /
    #    update_partial_variables, impl_neural_quantum_state.hpp:746-764,
    #    876-908): freeze all but a chosen set of hidden units ------------
    def grad_log_partial(self, params: Params, cache: Cache, hidden_nodes) -> C:
        """O_k restricted to [wi1[:, J], b1[J], w1o[J]] for hidden subset J,
        flattened in the reference's partial layout (wi1 column-major per
        node: [wi1_0j0, wi1_1j0, ..., b1_j0, ..., w1o_j0, ...])."""
        nodes = jnp.asarray(hidden_nodes, jnp.int32)
        k = cache.spins.shape[0]
        y_sub = cache.y[:, nodes]
        w1o_sub = params["w1o"][nodes]
        t = cplx.ctanh(y_sub) * w1o_sub  # (K, |J|)
        d_dwi1 = _outer_rs(cache.spins, t)  # (K, N, |J|)
        # reference partial layout groups per-node columns first
        d_dwi1 = C(
            jnp.transpose(d_dwi1.re, (0, 2, 1)).reshape(k, -1),
            jnp.transpose(d_dwi1.im, (0, 2, 1)).reshape(k, -1),
        )
        d_dw1o = cplx.clogcosh(y_sub)
        return cplx.concat([d_dwi1, t, d_dw1o], axis=-1)

    def update_params_partial(self, params: Params, dx: C, lr: float, hidden_nodes) -> Params:
        """theta_J <- theta_J - lr * dx for the hidden subset only."""
        nodes = jnp.asarray(hidden_nodes, jnp.int32)
        n, nj = self.n_inputs, len(hidden_nodes)
        dwi1 = dx[: n * nj].reshape(nj, n)  # per-node rows (reference layout)
        db1 = dx[n * nj : n * nj + nj]
        dw1o = dx[n * nj + nj :]
        wi1 = C(
            params["wi1"].re.at[:, nodes].add(-lr * dwi1.re.T),
            params["wi1"].im.at[:, nodes].add(-lr * dwi1.im.T),
        )
        b1 = C(params["b1"].re.at[nodes].add(-lr * db1.re), params["b1"].im.at[nodes].add(-lr * db1.im))
        w1o = C(params["w1o"].re.at[nodes].add(-lr * dw1o.re), params["w1o"].im.at[nodes].add(-lr * dw1o.im))
        return {"wi1": wi1, "b1": b1, "w1o": w1o}


@dataclasses.dataclass(frozen=True)
class FFNNTrSymm(Machine):
    """Translation-symmetric FFNN: variables_ = [wi1 (alpha,N), b1 (alpha,),
    w1o (alpha,)]; H = alpha*N, h = f*N+j; wf1 circulant, per-filter b1/w1o
    broadcast (impl_neural_quantum_state.hpp:1020-1204)."""

    alpha: int = 1

    @property
    def n_vars(self) -> int:
        return self.alpha * self.n_inputs + 2 * self.alpha

    @property
    def n_hidden(self) -> int:
        return self.alpha * self.n_inputs

    def param_spec(self):
        return [("wi1", (self.alpha, self.n_inputs)), ("b1", (self.alpha,)), ("w1o", (self.alpha,))]

    def init_params(self, key: jax.Array) -> Params:
        n, al = self.n_inputs, self.alpha
        k1, k2, k3 = jax.random.split(key, 3)
        sw, sb = (1.0 / ((1 + al) * n)) ** 0.5, (1.0 / (al * n)) ** 0.5
        return {
            "wi1": self._normal(k1, (al, n), sw, imag_scale=0.1 * sw),
            "b1": self._normal(k2, (al,), sb, imag_scale=0.1 * sb),
            "w1o": self._normal(k3, (al,), sb, imag_scale=0.1 * sb),
        }

    def make_work(self, params: Params) -> Work:
        n = self.n_inputs
        wf = _circulant_expand(params["wi1"], n)
        bf = cplx.repeat(params["b1"], n)
        cf = cplx.repeat(params["w1o"], n)
        return Work(w=wf, b=bf, a=None, c=cf)

    def grad_log(self, params: Params, cache: Cache) -> C:
        k, n, al = cache.spins.shape[0], self.n_inputs, self.alpha
        t = cplx.ctanh(cache.y).reshape(k, al, n)
        w1o = params["w1o"]
        tw = t * C(w1o.re[None, :, None], w1o.im[None, :, None])
        d_dwi1 = _circulant_grad(tw, cache.spins)  # (K, alpha, N)
        d_db1 = cplx.csum(tw, axis=-1)  # (K, alpha)
        d_dw1o = cplx.csum(cplx.clogcosh(cache.y).reshape(k, al, n), axis=-1)
        return cplx.concat([d_dwi1.reshape(k, -1), d_db1, d_dw1o], axis=-1)


@dataclasses.dataclass(frozen=True)
class FFNNSfSymm(Machine):
    """Spin-flip symmetric FFNN: no bias; variables_ = [wi1 (N, alpha*N)
    row-major, w1o (alpha*N,)] (impl_neural_quantum_state.hpp:1208-1348)."""

    alpha: int = 1

    @property
    def n_vars(self) -> int:
        n = self.n_inputs
        return self.alpha * n * n + self.alpha * n

    @property
    def n_hidden(self) -> int:
        return self.alpha * self.n_inputs

    def param_spec(self):
        n, h = self.n_inputs, self.alpha * self.n_inputs
        return [("wi1", (n, h)), ("w1o", (h,))]

    def init_params(self, key: jax.Array) -> Params:
        n, al = self.n_inputs, self.alpha
        k1, k2 = jax.random.split(key)
        sw, so = (1.0 / ((1 + al) * n)) ** 0.5, (1.0 / (al * n)) ** 0.5
        return {
            "wi1": self._normal(k1, (n, al * n), sw, imag_scale=0.1 * sw),
            "w1o": self._normal(k2, (al * n,), so, imag_scale=0.1 * so),
        }

    def make_work(self, params: Params) -> Work:
        h = self.alpha * self.n_inputs
        return Work(w=params["wi1"], b=self._zeros((h,)), a=None, c=params["w1o"])

    def grad_log(self, params: Params, cache: Cache) -> C:
        k = cache.spins.shape[0]
        t = cplx.ctanh(cache.y) * params["w1o"]
        d_dwi1 = _outer_rs(cache.spins, t)
        d_dw1o = cplx.clogcosh(cache.y)
        return cplx.concat([d_dwi1.reshape(k, -1), d_dw1o], axis=-1)
