"""Checkpoint / resume.

Two formats:

1. Reference-compatible plain text: C++ iostream complex literals
   ``(re,im)`` separated by whitespace, one file per tensor for RBM/FFNN
   (prefix + Dw/Da/Db.dat resp. Dw1/Dw2/Db1.dat - cpu/src/CH-train_rbm.cpp
   :71-73,96-98, CH-train_ffnn.cpp:71-73,96-98;
   impl_neural_quantum_state.hpp:258-326, :911-979) and one whole-vector
   file at the bare prefix for the symmetric ansatze (:539-547,
   gpu impl_neural_quantum_state.cuh RBMZ2PrSymm::save). Parameters trained
   with the reference load directly into this framework and vice versa.

2. Structured .npz checkpoints carrying params + optimizer step + RNG key
   + walker spins, so a run resumes bit-compatibly - the reference does NOT
   checkpoint its lambda-schedule step or RNG position (SURVEY.md 5).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from neural_network_quantum_state_tpu.models.base import Machine, Params
from neural_network_quantum_state_tpu.ops import cplx
from neural_network_quantum_state_tpu.ops.cplx import C

_COMPLEX_RE = re.compile(r"\(([^,()]+),([^,()]+)\)")

# per-tensor text-file suffixes of the non-symmetric machines
_TENSOR_FILES = {
    "RBM": {"w": "Dw.dat", "a": "Da.dat", "b": "Db.dat"},
    "FFNN": {"wi1": "Dw1.dat", "w1o": "Dw2.dat", "b1": "Db1.dat"},
}


def _format_complex_array(z: np.ndarray, precision: int) -> str:
    from neural_network_quantum_state_tpu.utils import native

    out = native.format_complex_text(z.reshape(-1), precision)
    if out is not None:
        return out.rstrip()
    flat = z.reshape(-1)
    return " ".join(f"({v.real:.{precision}g},{v.imag:.{precision}g})" for v in flat)


def _parse_complex_text(text: str) -> np.ndarray:
    from neural_network_quantum_state_tpu.utils import native

    out = native.parse_complex_text(text)
    if out is not None:
        return out
    vals = [complex(float(m.group(1)), float(m.group(2))) for m in _COMPLEX_RE.finditer(text)]
    return np.asarray(vals)


def _host_split(z: np.ndarray, rdtype) -> C:
    """complex numpy -> split-complex C, splitting on the HOST (a complex
    jnp.asarray would materialize a complex device array, which TPU lacks)."""
    return C(jnp.asarray(np.ascontiguousarray(z.real), rdtype), jnp.asarray(np.ascontiguousarray(z.imag), rdtype))


def save_reference_text(machine: Machine, params: Params, prefix: str, precision: int | None = None) -> list[str]:
    """Write reference-format text checkpoint(s); returns written paths.

    Default precision follows FloatTypeTrait_ (cpu common.hpp:40-42):
    8 digits for float32 machines, 15 for float64."""
    if precision is None:
        precision = 8 if jnp.dtype(machine.real_dtype) == jnp.float32 else 15
    kind = type(machine).__name__
    written = []
    if kind in _TENSOR_FILES:
        for name, suffix in _TENSOR_FILES[kind].items():
            z = cplx.to_numpy_complex(params[name])
            path = prefix + suffix
            with open(path, "w") as f:
                f.write(_format_complex_array(z, precision) + "\n")
            written.append(path)
    else:
        # symmetric machines: single whole-variables_ file at the prefix
        vec = cplx.to_numpy_complex(machine.flatten_params(params))
        with open(prefix, "w") as f:
            f.write(_format_complex_array(vec, precision) + "\n")
        written.append(prefix)
    return written


def load_reference_text(machine: Machine, prefix: str) -> Params:
    """Read reference-format text checkpoint(s) into params."""
    kind = type(machine).__name__
    spec = dict(machine.param_spec())
    if kind in _TENSOR_FILES:
        out = {}
        for name, suffix in _TENSOR_FILES[kind].items():
            z = _parse_complex_text(open(prefix + suffix).read())
            shape = spec[name]
            if z.size != int(np.prod(shape)):
                raise ValueError(f"{prefix + suffix}: expected {shape}, got {z.size} values")
            out[name] = _host_split(z.reshape(shape), machine.real_dtype)
        return out
    vec = _parse_complex_text(open(prefix).read())
    if vec.size != machine.n_vars:
        raise ValueError(f"{prefix}: expected {machine.n_vars} values, got {vec.size}")
    return machine.unflatten_params(_host_split(vec, machine.real_dtype))


# ---------------------------------------------------------------------------
def save_npz(path: str, machine: Machine, params: Params, step: int = 0,
             key: Optional[jax.Array] = None, spins: Optional[jnp.ndarray] = None) -> None:
    """Structured checkpoint: params (+ step, RNG key, walker spins)."""
    payload = {"__step__": np.asarray(step), "__machine__": np.asarray(type(machine).__name__)}
    for name, _ in machine.param_spec():
        payload[f"{name}.re"] = np.asarray(params[name].re)
        payload[f"{name}.im"] = np.asarray(params[name].im)
    if key is not None:
        payload["__key__"] = np.asarray(jax.random.key_data(key) if hasattr(jax.random, "key_data") else key)
    if spins is not None:
        payload["__spins__"] = np.asarray(spins)
    np.savez(path, **payload)


def load_npz(path: str, machine: Machine):
    """Returns (params, step, key_data | None, spins | None)."""
    data = np.load(path, allow_pickle=False)
    name = str(data["__machine__"])
    if name != type(machine).__name__:
        raise ValueError(f"checkpoint is for {name}, not {type(machine).__name__}")
    params = {}
    for pname, shape in machine.param_spec():
        params[pname] = C(
            jnp.asarray(data[f"{pname}.re"], machine.real_dtype),
            jnp.asarray(data[f"{pname}.im"], machine.real_dtype),
        )
    step = int(data["__step__"])
    key = jnp.asarray(data["__key__"]) if "__key__" in data else None
    spins = jnp.asarray(data["__spins__"]) if "__spins__" in data else None
    return params, step, key, spins


# ---------------------------------------------------------------------------
def save_orbax(path: str, machine: Machine, params: Params, step: int = 0,
               key: Optional[jax.Array] = None, spins: Optional[jnp.ndarray] = None,
               extra: Optional[dict] = None) -> str:
    """Orbax-backed checkpoint (production option alongside the reference
    text format and .npz): async-capable, multi-host-safe (each process
    writes only its shards of sharded arrays), atomic directory commit.
    Returns the checkpoint directory path.

    Everything device-side stays split-complex (C pairs are NamedTuple
    pytrees), so no complex dtypes hit storage either."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # StandardCheckpointer holds arrays only - carry the machine name as bytes
    name_u8 = np.frombuffer(type(machine).__name__.encode(), dtype=np.uint8).copy()
    state = {"machine": name_u8, "step": np.asarray(step), "params": dict(params)}
    if key is not None:
        state["key"] = np.asarray(jax.random.key_data(key) if hasattr(jax.random, "key_data") else key)
    if spins is not None:
        state["spins"] = spins
    if extra:
        state["extra"] = dict(extra)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def load_orbax(path: str, machine: Machine):
    """Returns (params, step, key_data | None, spins | None, extra | None).
    Arrays restore as numpy and are cast host-side to the machine's real
    dtype (the TPU backend has no f64, so f64-saved checkpoints load
    cleanly into f32 machines and vice versa)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(path))
    name = bytes(np.asarray(state["machine"], dtype=np.uint8)).decode()
    if name != type(machine).__name__:
        raise ValueError(f"checkpoint is for {name}, not {type(machine).__name__}")
    spec = dict(machine.param_spec())
    params = {}
    for pname, shape in spec.items():
        leaf = state["params"][pname]
        # a C NamedTuple restores as {'re': ..., 'im': ...} without a target tree
        re_, im_ = (leaf["re"], leaf["im"]) if isinstance(leaf, dict) else (leaf[0], leaf[1])
        re_, im_ = np.asarray(re_), np.asarray(im_)
        if re_.shape != tuple(shape):
            raise ValueError(f"{pname}: expected {tuple(shape)}, got {re_.shape}")
        params[pname] = C(jnp.asarray(re_, machine.real_dtype), jnp.asarray(im_, machine.real_dtype))
    step = int(np.asarray(state["step"]))
    key = jnp.asarray(state["key"]) if "key" in state else None
    spins = jnp.asarray(state["spins"], machine.real_dtype) if "spins" in state else None
    return params, step, key, spins, state.get("extra")
