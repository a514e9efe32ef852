// Single-core C++ statevector simulator over tensor-encoded genomes.
//
// Role: the benchmark's Aer stand-in.  The reference delegates circuit
// evaluation to qiskit-aer's C++ statevector simulator, with one circuit
// per dask/thread worker (so ~one CPU core per concurrent evaluation,
// SURVEY.md §2.2).  Aer is not installed in this image, so bench.py uses
// this vendored gate loop — a contiguous complex<float> statevector with
// the same U3/CU3 semantics, compiled -O3 -march=native — as the
// defensible per-core CPU denominator for the TPU speedup claim.
//
// Also reusable as a host-side oracle for small-n validation.

#include <complex>
#include <cstdint>
#include <cmath>

using cfloat = std::complex<float>;

extern "C" {

// Apply one genome circuit and contract measurement probabilities with a
// diagonal energy table.  Gate codes: 0=identity, 1=rotation(U3),
// 2=control(no-op), 3=controlled-rotation(CU3, control index in
// `controls`).  Slots are applied qubit-ascending within each layer,
// matching the JAX engine (sim/statevector.py).
//
//   gate_types [layers, n_qubits] int32
//   controls   [layers, n_qubits] int32
//   angles     [layers, n_qubits, 3] float  (theta, phi, lambda)
//   layer_mask [layers] uint8
//   table      [2^n_qubits] float
//   state      [2^n_qubits] cfloat scratch (caller-allocated)
//
// Returns the energy <psi|diag(table)|psi>.
static float simulate_one(
    const int32_t* gate_types,
    const int32_t* controls,
    const float* angles,
    const uint8_t* layer_mask,
    int32_t n_layers,
    int32_t n_qubits,
    const float* table,
    cfloat* state)
{
    const int64_t dim = int64_t(1) << n_qubits;
    for (int64_t i = 0; i < dim; ++i) state[i] = cfloat(0.0f, 0.0f);
    state[0] = cfloat(1.0f, 0.0f);

    for (int32_t l = 0; l < n_layers; ++l) {
        if (!layer_mask[l]) continue;
        for (int32_t q = 0; q < n_qubits; ++q) {
            const int32_t code = gate_types[l * n_qubits + q];
            if (code != 1 && code != 3) continue;  // identity / control slot

            const float* a = angles + (int64_t(l) * n_qubits + q) * 3;
            const float theta = a[0], phi = a[1], lam = a[2];
            const float c = std::cos(theta * 0.5f), s = std::sin(theta * 0.5f);
            const cfloat u00(c, 0.0f);
            const cfloat u01(-std::cos(lam) * s, -std::sin(lam) * s);
            const cfloat u10(std::cos(phi) * s, std::sin(phi) * s);
            const cfloat u11(std::cos(phi + lam) * c, std::sin(phi + lam) * c);

            const int64_t low = int64_t(1) << q;
            if (code == 1) {
                for (int64_t block = 0; block < dim; block += 2 * low) {
                    for (int64_t i = block; i < block + low; ++i) {
                        const cfloat s0 = state[i];
                        const cfloat s1 = state[i + low];
                        state[i] = u00 * s0 + u01 * s1;
                        state[i + low] = u10 * s0 + u11 * s1;
                    }
                }
            } else {
                const int64_t cbit = int64_t(1) << controls[l * n_qubits + q];
                for (int64_t block = 0; block < dim; block += 2 * low) {
                    for (int64_t i = block; i < block + low; ++i) {
                        if (!(i & cbit)) continue;
                        const cfloat s0 = state[i];
                        const cfloat s1 = state[i + low];
                        state[i] = u00 * s0 + u01 * s1;
                        state[i + low] = u10 * s0 + u11 * s1;
                    }
                }
            }
        }
    }

    double energy = 0.0;
    for (int64_t i = 0; i < dim; ++i) {
        const float p = state[i].real() * state[i].real() + state[i].imag() * state[i].imag();
        energy += double(p) * double(table[i]);
    }
    return float(energy);
}

// Batched entry point: evaluate a whole packed population sequentially on
// one core (the per-worker workload shape of the reference).
void population_energies_cpu(
    const int32_t* gate_types,   // [pop, layers, n_qubits]
    const int32_t* controls,     // [pop, layers, n_qubits]
    const float* angles,         // [pop, layers, n_qubits, 3]
    const uint8_t* layer_mask,   // [pop, layers]
    int32_t pop,
    int32_t n_layers,
    int32_t n_qubits,
    const float* table,          // [2^n_qubits]
    float* out_energies,         // [pop]
    cfloat* scratch)             // [2^n_qubits]
{
    const int64_t per_genome = int64_t(n_layers) * n_qubits;
    for (int32_t p = 0; p < pop; ++p) {
        out_energies[p] = simulate_one(
            gate_types + p * per_genome,
            controls + p * per_genome,
            angles + p * per_genome * 3,
            layer_mask + int64_t(p) * n_layers,
            n_layers, n_qubits, table, scratch);
    }
}

// Probability vector of one genome (oracle use).
void probabilities_cpu(
    const int32_t* gate_types,
    const int32_t* controls,
    const float* angles,
    const uint8_t* layer_mask,
    int32_t n_layers,
    int32_t n_qubits,
    float* out_probs,            // [2^n_qubits]
    cfloat* scratch)
{
    const int64_t dim = int64_t(1) << n_qubits;
    // reuse simulate_one with a zero table, then read the scratch state
    static const float zero = 0.0f;
    (void)zero;
    float* table = new float[dim]();
    simulate_one(gate_types, controls, angles, layer_mask, n_layers, n_qubits, table, scratch);
    delete[] table;
    for (int64_t i = 0; i < dim; ++i) {
        out_probs[i] = scratch[i].real() * scratch[i].real() + scratch[i].imag() * scratch[i].imag();
    }
}

}  // extern "C"
