"""ctypes bindings for the native host kernels (csrc/).

Loads (building on first use, ``g++ -O3 -march=native``) the shared
library of host-side kernels; every entry point has a numpy fallback so
the package works without a toolchain.  pybind11 is deliberately not used
(not available in the target image) — plain ``extern "C"`` + ctypes.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SOURCES = [
    _REPO_ROOT / "csrc" / "diag_table.cpp",
    _REPO_ROOT / "csrc" / "statevector_sim.cpp",
]
_BUILD_DIR = _REPO_ROOT / "build"
_LIBRARY = _BUILD_DIR / "libqueasars_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build_library() -> bool:
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        *[str(source) for source in _SOURCES], "-o", str(_LIBRARY),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        stale = not _LIBRARY.exists() or any(
            source.exists() and source.stat().st_mtime > _LIBRARY.stat().st_mtime
            for source in _SOURCES
        )
        if stale:
            if not all(source.exists() for source in _SOURCES) or not _build_library():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIBRARY))
        except OSError:
            _load_failed = True
            return None

        u64_p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        f64_p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.diag_energy_table.argtypes = [f64_p, u64_p, ctypes.c_int64, ctypes.c_int32, f64_p]
        lib.diag_energy_table.restype = None
        lib.diag_argmin.argtypes = [
            f64_p, u64_p, ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_double)
        ]
        lib.diag_argmin.restype = ctypes.c_int64
        lib.diag_energies_at.argtypes = [f64_p, u64_p, ctypes.c_int64, u64_p, ctypes.c_int64, f64_p]
        lib.diag_energies_at.restype = None

        i32_p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8_p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32_p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        c64_p = np.ctypeslib.ndpointer(np.complex64, flags="C_CONTIGUOUS")
        lib.population_energies_cpu.argtypes = [
            i32_p, i32_p, f32_p, u8_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            f32_p, f32_p, c64_p,
        ]
        lib.population_energies_cpu.restype = None
        lib.probabilities_cpu.argtypes = [
            i32_p, i32_p, f32_p, u8_p,
            ctypes.c_int32, ctypes.c_int32,
            f32_p, c64_p,
        ]
        lib.probabilities_cpu.restype = None
        _lib = lib
        return _lib


def native_diagonal_energy_table(
    coeffs: np.ndarray, z_masks: np.ndarray, n_qubits: int
) -> Optional[np.ndarray]:
    """C++ energy table [2^n] float64; None when the library is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    coeffs = np.ascontiguousarray(coeffs, dtype=np.float64)
    z_masks = np.ascontiguousarray(z_masks, dtype=np.uint64)
    out = np.empty(1 << n_qubits, dtype=np.float64)
    lib.diag_energy_table(coeffs, z_masks, coeffs.shape[0], n_qubits, out)
    return out


def native_diag_argmin(
    coeffs: np.ndarray, z_masks: np.ndarray, n_qubits: int
) -> Optional[tuple[int, float]]:
    """(argmin_state, min_energy) of the diagonal spectrum; None if
    unavailable.  O(1) memory — never materializes the table."""
    lib = load_native()
    if lib is None:
        return None
    coeffs = np.ascontiguousarray(coeffs, dtype=np.float64)
    z_masks = np.ascontiguousarray(z_masks, dtype=np.uint64)
    min_out = ctypes.c_double()
    idx = lib.diag_argmin(coeffs, z_masks, coeffs.shape[0], n_qubits, ctypes.byref(min_out))
    return int(idx), float(min_out.value)


def native_diag_energies_at(
    coeffs: np.ndarray, z_masks: np.ndarray, states: np.ndarray
) -> Optional[np.ndarray]:
    """Energies of selected basis states; None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    coeffs = np.ascontiguousarray(coeffs, dtype=np.float64)
    z_masks = np.ascontiguousarray(z_masks, dtype=np.uint64)
    states = np.ascontiguousarray(states, dtype=np.uint64)
    out = np.empty(states.shape[0], dtype=np.float64)
    lib.diag_energies_at(coeffs, z_masks, coeffs.shape[0], states, states.shape[0], out)
    return out


def native_population_energies(
    gate_types: np.ndarray,
    controls: np.ndarray,
    angles: np.ndarray,
    layer_mask: np.ndarray,
    table: np.ndarray,
    n_qubits: int,
) -> Optional[np.ndarray]:
    """Single-core C++ statevector evaluation of a packed population —
    the benchmark's qiskit-aer stand-in (csrc/statevector_sim.cpp) and a
    host oracle for small-n validation.  None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    gate_types = np.ascontiguousarray(gate_types, dtype=np.int32)
    controls = np.ascontiguousarray(controls, dtype=np.int32)
    angles = np.ascontiguousarray(angles, dtype=np.float32)
    layer_mask = np.ascontiguousarray(layer_mask, dtype=np.uint8)
    table = np.ascontiguousarray(table, dtype=np.float32)
    pop, n_layers = gate_types.shape[0], gate_types.shape[1]
    out = np.empty(pop, dtype=np.float32)
    scratch = np.empty(1 << n_qubits, dtype=np.complex64)
    lib.population_energies_cpu(
        gate_types, controls, angles, layer_mask,
        pop, n_layers, n_qubits, table, out, scratch,
    )
    return out


def native_probabilities(
    gate_types: np.ndarray,
    controls: np.ndarray,
    angles: np.ndarray,
    layer_mask: np.ndarray,
    n_qubits: int,
) -> Optional[np.ndarray]:
    """C++ measurement probabilities of ONE genome ([L, n] tensors);
    None if unavailable."""
    lib = load_native()
    if lib is None:
        return None
    gate_types = np.ascontiguousarray(gate_types, dtype=np.int32)
    controls = np.ascontiguousarray(controls, dtype=np.int32)
    angles = np.ascontiguousarray(angles, dtype=np.float32)
    layer_mask = np.ascontiguousarray(layer_mask, dtype=np.uint8)
    out = np.empty(1 << n_qubits, dtype=np.float32)
    scratch = np.empty(1 << n_qubits, dtype=np.complex64)
    lib.probabilities_cpu(
        gate_types, controls, angles, layer_mask,
        gate_types.shape[0], n_qubits, out, scratch,
    )
    return out
