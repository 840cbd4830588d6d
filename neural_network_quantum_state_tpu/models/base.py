"""Machine (ansatz) protocol.

A Machine is a frozen config object whose methods are pure functions - the
mutable state of the reference's machine classes (variables_, y_, sa_,
spinStates_: cpu/include/neural_quantum_state.hpp:24-247) becomes explicit
pytrees:

- ``params``: dict of raw parameter tensors as split-complex ``C`` pairs
  (TPU has no complex dtypes - see ops.cplx),
- ``Work``: effective dense weights built from params (symmetry expansion;
  reference ``construct_weight_and_bias_``),
- ``Cache``: per-walker (spins, y, sa), threaded through the sampler.

The flattened parameter order of each machine matches the reference's
``variables_`` layout exactly so that S-matrix vectors, checkpoints and
gradients are cross-comparable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.dtypes import real_dtype as _real_of
from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C
from neural_network_quantum_state_tpu.ops.engine import Cache, Work, full_forward

Params = Dict[str, C]


@dataclasses.dataclass(frozen=True)
class Machine:
    """Base class: static shape info + pure functional methods."""

    n_inputs: int
    dtype: Any = jnp.float32  # real dtype of the split planes (f32/f64)

    # ---- mandatory interface -------------------------------------------
    @property
    def n_vars(self) -> int:
        raise NotImplementedError

    @property
    def n_hidden(self) -> int:
        """Effective hidden-unit count H of the expanded Work."""
        raise NotImplementedError

    def init_params(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def make_work(self, params: Params) -> Work:
        """Expand raw params into effective dense (W, b, a, c)."""
        raise NotImplementedError

    def grad_log(self, params: Params, cache: Cache) -> C:
        """Closed-form O_k = d ln psi / d theta, flattened: C of (K, n_vars).

        Mirrors the reference's ``backward`` (no autodiff there either);
        verified against jax.grad in tests.
        """
        raise NotImplementedError

    # ---- shared helpers -------------------------------------------------
    def param_spec(self) -> list[tuple[str, tuple[int, ...]]]:
        """(name, shape) list in reference ``variables_`` order."""
        raise NotImplementedError

    def flatten_params(self, params: Params) -> C:
        parts = [params[name].reshape(-1) for name, _ in self.param_spec()]
        return cplx.concat(parts, axis=0)

    def unflatten_params(self, vec: C) -> Params:
        out, off = {}, 0
        for name, shape in self.param_spec():
            size = int(np.prod(shape))
            out[name] = vec[off : off + size].reshape(shape)
            off += size
        return out

    def update_params(self, params: Params, dx_flat: C, lr: float) -> Params:
        """theta <- theta - lr * dx (reference ``update_variables``)."""
        dx = self.unflatten_params(dx_flat)
        return {k: params[k] - dx[k] * lr for k in params}

    def init_cache(self, params: Params, spins: jnp.ndarray) -> tuple[Cache, C]:
        return full_forward(self.make_work(params), spins)

    @property
    def real_dtype(self):
        return _real_of(self.dtype)

    def _normal(self, key: jax.Array, shape, scale: float, imag_scale: float | None = None) -> C:
        """Split-complex Gaussian init: re ~ s*N(0,1), im ~ s_im*N(0,1).

        The RBM family scales both planes by 0.1*sqrt(1/fan)
        (impl_neural_quantum_state.hpp:49-66); the FFNN family scales only
        the imaginary plane by 0.1 (impl:726-732).
        """
        kr, ki = jax.random.split(key)
        rdt = self.real_dtype
        im_s = scale if imag_scale is None else imag_scale
        return C(
            scale * jax.random.normal(kr, shape, rdt),
            im_s * jax.random.normal(ki, shape, rdt),
        )

    def _zeros(self, shape) -> C:
        return cplx.zeros(shape, self.real_dtype)
