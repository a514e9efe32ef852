// Native host kernels for queasars_tpu.
//
// Diagonal Pauli-sum energy tables: e[i] = sum_k c_k * (-1)^popcount(z_k & i)
// over all 2^n basis states.  This is the host-side cost of every solve
// (the table ships to the device once per Hamiltonian) and the exhaustive
// spectrum oracle for tests; the reference delegates the equivalent work to
// qiskit's Rust/C++ core (SparsePauliOp arithmetic + _evaluate_sparsepauli).
//
// Built as a plain shared library (no pybind11 in this image); the Python
// side binds via ctypes (queasars_tpu/utils/native.py) and falls back to
// numpy when the library is unavailable.

#include <cstdint>
#include <cmath>

extern "C" {

// out[2^n_qubits] <- energy table, accumulated in double.
void diag_energy_table(const double* coeffs,
                       const uint64_t* z_masks,
                       int64_t n_terms,
                       int32_t n_qubits,
                       double* out) {
    const int64_t dim = int64_t(1) << n_qubits;
    for (int64_t i = 0; i < dim; ++i) out[i] = 0.0;
    for (int64_t k = 0; k < n_terms; ++k) {
        const double c = coeffs[k];
        const uint64_t z = z_masks[k];
        if (z == 0) {
            for (int64_t i = 0; i < dim; ++i) out[i] += c;
            continue;
        }
        for (int64_t i = 0; i < dim; ++i) {
            const int parity = __builtin_popcountll(z & uint64_t(i)) & 1;
            out[i] += parity ? -c : c;
        }
    }
}

// Minimum entry and its index without materializing the table.
// Returns the argmin; *min_out receives the minimum energy.
int64_t diag_argmin(const double* coeffs,
                    const uint64_t* z_masks,
                    int64_t n_terms,
                    int32_t n_qubits,
                    double* min_out) {
    const int64_t dim = int64_t(1) << n_qubits;
    double best = 0.0;
    int64_t best_idx = 0;
    for (int64_t i = 0; i < dim; ++i) {
        double e = 0.0;
        for (int64_t k = 0; k < n_terms; ++k) {
            const int parity = __builtin_popcountll(z_masks[k] & uint64_t(i)) & 1;
            e += parity ? -coeffs[k] : coeffs[k];
        }
        if (i == 0 || e < best) {
            best = e;
            best_idx = i;
        }
    }
    *min_out = best;
    return best_idx;
}

// Energies of selected basis states (sparse evaluation for decoders/tests).
void diag_energies_at(const double* coeffs,
                      const uint64_t* z_masks,
                      int64_t n_terms,
                      const uint64_t* states,
                      int64_t n_states,
                      double* out) {
    for (int64_t s = 0; s < n_states; ++s) {
        double e = 0.0;
        const uint64_t state = states[s];
        for (int64_t k = 0; k < n_terms; ++k) {
            const int parity = __builtin_popcountll(z_masks[k] & state) & 1;
            e += parity ? -coeffs[k] : coeffs[k];
        }
        out[s] = e;
    }
}

}  // extern "C"
