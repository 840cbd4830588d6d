"""Native host library: codec round-trips vs the Python implementation,
binary metrics recorder, graceful fallback."""

import numpy as np
import pytest

from neural_network_quantum_state_tpu.utils import native


def test_native_builds_and_loads():
    lib = native.load()
    assert lib is not None, "g++ toolchain present in this image; build should succeed"


def test_parse_format_roundtrip(rng):
    z = rng.normal(size=257) + 1j * rng.normal(size=257)
    text = native.format_complex_text(z, precision=17)
    assert text is not None
    back = native.parse_complex_text(text)
    np.testing.assert_allclose(back, z, rtol=0, atol=0)


def test_parse_matches_python_regex(rng):
    import re

    z = rng.normal(size=64) + 1j * rng.normal(size=64)
    text = " ".join(f"({v.real:.15g},{v.imag:.15g})" for v in z)
    got = native.parse_complex_text(text)
    pat = re.compile(r"\(([^,()]+),([^,()]+)\)")
    want = np.asarray([complex(float(m.group(1)), float(m.group(2))) for m in pat.finditer(text)])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_parse_malformed_returns_none_or_partial():
    assert native.parse_complex_text("(1.0;2.0)") is None  # malformed separator


def test_metrics_recorder_roundtrip(tmp_path):
    path = str(tmp_path / "m.bin")
    rec = native.BinaryMetricsRecorder(path, ["step", "energy", "rsd"])
    rec.write(0, -1.5, 0.1)
    rec.write(1, -1.6, 0.05)
    rec.close()
    # append across reopen
    rec2 = native.BinaryMetricsRecorder(path, ["step", "energy", "rsd"])
    rec2.write(2, -1.7, 0.01)
    rec2.close()
    data = native.BinaryMetricsRecorder.read(path)
    assert data.shape == (3, 3)
    np.testing.assert_allclose(data[:, 1], [-1.5, -1.6, -1.7])


def test_checkpoint_uses_native_codec(tmp_path):
    """End-to-end through the checkpoint layer (native codec engaged)."""
    import jax
    import jax.numpy as jnp

    from neural_network_quantum_state_tpu.models import RBMTrSymm
    from neural_network_quantum_state_tpu.ops import cplx
    from neural_network_quantum_state_tpu.utils.checkpoint import (
        load_reference_text,
        save_reference_text,
    )

    machine = RBMTrSymm(n_inputs=8, alpha=2, dtype=jnp.float64)
    params = machine.init_params(jax.random.PRNGKey(0))
    prefix = str(tmp_path / "ckpt")
    save_reference_text(machine, params, prefix, precision=17)
    loaded = load_reference_text(machine, prefix)
    v0 = np.asarray(cplx.to_complex(machine.flatten_params(params)))
    v1 = np.asarray(cplx.to_complex(machine.flatten_params(loaded)))
    np.testing.assert_allclose(v0, v1, rtol=1e-15)
