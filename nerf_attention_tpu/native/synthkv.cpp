// Native synthetic-KV signal generator.
//
// Reimplements the per-(layer, head) signal recipe of synthetic.py (itself
// the behavioral twin of reference extract.py:182-259) in C++, including a
// faithful reimplementation of the numpy legacy RandomState draw chain so the
// streams are bit-identical to np.random.RandomState(seed):
//
//   * MT19937 seeded with init_genrand(seed)
//   * random_sample: ((a>>5)*2^26 + (b>>6)) / 2^53 from two 32-bit draws
//   * randint(lo, hi): masked rejection sampling on 32-bit draws
//     (verified against numpy: masked u32, not u64, for ranges < 2^32)
//   * randn: polar (Marsaglia) method returning f*x2 first, caching f*x1
//
// The float64 math (sin/cos/exp/log/sqrt) uses scalar libm, which matches
// numpy's scalar RNG path exactly; numpy's *vectorized* sin/cos used for the
// carrier waves may differ from libm by <=1 ulp on some builds, so the
// Python-side test asserts exact RNG parity and allows 1-ulp slack on the
// assembled signals.
//
// Built on demand by nerf_attention_tpu/native/__init__.py via g++ into
// build/synthkv.so and called through ctypes — no pybind11 dependency.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Constant-frequency sine via the rotation recurrence: 4 mults + 2 adds per
// sample instead of a ~30 ns libm sin. Double-precision drift over 10^4
// steps is ~1e-12 absolute — invisible at float32 output resolution.
struct Oscillator {
    double s, c, step_s, step_c;

    Oscillator(double omega_dt, double phase) {
        s = std::sin(phase);
        c = std::cos(phase);
        step_s = std::sin(omega_dt);
        step_c = std::cos(omega_dt);
    }

    inline double next() {  // returns current sin, then advances
        double cur = s;
        double ns = s * step_c + c * step_s;
        c = c * step_c - s * step_s;
        s = ns;
        return cur;
    }
};

struct MT19937 {
    uint32_t mt[624];
    int idx;

    explicit MT19937(uint32_t seed) {
        mt[0] = seed;
        for (int i = 1; i < 624; ++i) {
            mt[i] = 1812433253u * (mt[i - 1] ^ (mt[i - 1] >> 30)) + i;
        }
        idx = 624;
    }

    uint32_t u32() {
        if (idx >= 624) {
            for (int i = 0; i < 624; ++i) {
                uint32_t y = (mt[i] & 0x80000000u) | (mt[(i + 1) % 624] & 0x7fffffffu);
                mt[i] = mt[(i + 397) % 624] ^ (y >> 1);
                if (y & 1u) mt[i] ^= 2567483615u;
            }
            idx = 0;
        }
        uint32_t y = mt[idx++];
        y ^= y >> 11;
        y ^= (y << 7) & 2636928640u;
        y ^= (y << 15) & 4022730752u;
        y ^= y >> 18;
        return y;
    }
};

struct LegacyRandomState {
    MT19937 mt;
    bool has_gauss = false;
    double gauss_cache = 0.0;

    explicit LegacyRandomState(uint32_t seed) : mt(seed) {}

    double random_sample() {
        uint32_t a = mt.u32() >> 5, b = mt.u32() >> 6;
        return (a * 67108864.0 + b) / 9007199254740992.0;
    }

    double uniform(double lo, double hi) {
        return lo + (hi - lo) * random_sample();
    }

    // randint(lo, hi): one value in [lo, hi). Range must fit in uint32.
    long randint(long lo, long hi) {
        uint32_t rng = static_cast<uint32_t>(hi - lo - 1);  // max value
        if (rng == 0) return lo;
        uint32_t mask = rng;
        mask |= mask >> 1;
        mask |= mask >> 2;
        mask |= mask >> 4;
        mask |= mask >> 8;
        mask |= mask >> 16;
        uint32_t v;
        while ((v = (mt.u32() & mask)) > rng) {
        }
        return lo + static_cast<long>(v);
    }

    double gauss() {
        if (has_gauss) {
            has_gauss = false;
            return gauss_cache;
        }
        double f, x1, x2, r2;
        do {
            x1 = 2.0 * random_sample() - 1.0;
            x2 = 2.0 * random_sample() - 1.0;
            r2 = x1 * x1 + x2 * x2;
        } while (r2 >= 1.0 || r2 == 0.0);
        f = std::sqrt(-2.0 * std::log(r2) / r2);
        gauss_cache = f * x1;
        has_gauss = true;
        return f * x2;
    }
};

constexpr double kTwoPi = 6.283185307179586476925286766559;

// Sparse Gaussian bumps (synthetic.py:_spike_train).
void spike_train(LegacyRandomState& rng, int seq_len, double layer_sharpness,
                 double* spikes) {
    std::memset(spikes, 0, sizeof(double) * seq_len);
    int num_spikes = static_cast<int>(3.0 * layer_sharpness);
    int max_width = static_cast<int>(5.0 / layer_sharpness);
    if (max_width < 2) max_width = 2;
    for (int s = 0; s < num_spikes; ++s) {
        long pos = rng.randint(0, seq_len);
        long width = rng.randint(1, max_width);
        double amp = rng.uniform(0.5, 2.0);
        double sigma = width / 2.0;
        if (sigma < 1.0) sigma = 1.0;
        for (long off = -width; off <= width; ++off) {
            long c = pos + off;
            if (c < 0 || c >= seq_len) continue;
            double z = off / sigma;
            spikes[c] += amp * std::exp(-0.5 * z * z);
        }
    }
}

}  // namespace

extern "C" {

// Fill one head's (seq_len, head_dim) key and value matrices, row-major,
// draw-for-draw identical to synthetic.py:_head_signals with
// RandomState(seed).
void synth_head(uint32_t seed, int seq_len, int head_dim,
                double layer_sharpness, float* k_out, float* v_out) {
    LegacyRandomState rng(seed);
    double* spikes = new double[seq_len];

    // np.linspace(0, 1, S) step; the endpoint rows are pinned to exactly
    // t=1.0 inline below (the oscillators recurse over s*dt otherwise).
    const double dt = seq_len > 1 ? 1.0 / (seq_len - 1) : 0.0;
    for (int d = 0; d < head_dim; ++d) {
        double freq1 = rng.uniform(1.0, 5.0);
        double freq2 = rng.uniform(3.0, 10.0);
        double freq_mid = rng.uniform(10.0, 30.0);
        double phase = rng.uniform(0.0, kTwoPi);
        spike_train(rng, seq_len, layer_sharpness, spikes);
        // Key noise first (matches the numpy draw order), then assemble.
        Oscillator o1(kTwoPi * freq1 * dt, 0.0);
        Oscillator o2(kTwoPi * freq2 * dt, kTwoPi / 4.0);  // cos = sin(x+pi/2)
        Oscillator om(kTwoPi * freq_mid * dt, phase);
        for (int s = 0; s < seq_len; ++s) {
            double base, mid;
            if (seq_len > 1 && s == seq_len - 1) {  // pinned endpoint t=1.0
                base = 0.5 * std::sin(kTwoPi * freq1)
                     + 0.3 * std::cos(kTwoPi * freq2);
                mid = 0.2 * std::sin(kTwoPi * freq_mid + phase);
            } else {
                base = 0.5 * o1.next() + 0.3 * o2.next();
                mid = 0.2 * om.next();
            }
            double noise = rng.gauss() * 0.1;
            k_out[(size_t)s * head_dim + d] =
                static_cast<float>(base + mid + spikes[s] + noise);
        }
        double v_freq = rng.uniform(1.0, 8.0);
        Oscillator ov(kTwoPi * v_freq * dt, 0.0);
        for (int s = 0; s < seq_len; ++s) {
            double vb = (seq_len > 1 && s == seq_len - 1)
                            ? std::sin(kTwoPi * v_freq)
                            : ov.next();
            double v = 0.6 * vb + rng.gauss() * 0.15;
            v_out[(size_t)s * head_dim + d] = static_cast<float>(v);
        }
    }
    delete[] spikes;
}

// Fill a whole layer, one thread per head (heads have independent RNG
// streams seeded seed_offset + layer*num_heads + head, synthetic.py:119).
// k_out/v_out: (num_heads, seq_len, head_dim) row-major float32.
void synth_layer(uint32_t base_seed, int num_heads, int seq_len, int head_dim,
                 double layer_sharpness, float* k_out, float* v_out) {
    std::vector<std::thread> workers;
    const size_t head_elems = (size_t)seq_len * head_dim;
    for (int h = 0; h < num_heads; ++h) {
        workers.emplace_back([=]() {
            synth_head(base_seed + h, seq_len, head_dim, layer_sharpness,
                       k_out + h * head_elems, v_out + h * head_elems);
        });
    }
    for (auto& w : workers) w.join();
}

// Fill one head's (seq_len, head_dim) HARD-mode value matrix, draw-for-draw
// identical to synthetic.py:_hard_values with RandomState(seed): per dim a
// weak smooth carrier (freq U(1,8), phase U(0,2pi); amplitude depth-graded
// and content-scaled by the caller via carrier_amp — deterministic, no RNG
// draws), a spike train at doubled sharpness, and dominant per-sample
// Gaussian noise at noise_amp (0.30 * the caller's content noise scale).
void synth_hard_values(uint32_t seed, int seq_len, int head_dim,
                       double layer_sharpness, double carrier_amp,
                       double noise_amp, float* v_out) {
    LegacyRandomState rng(seed);
    double* spikes = new double[seq_len];
    const double dt = seq_len > 1 ? 1.0 / (seq_len - 1) : 0.0;
    for (int d = 0; d < head_dim; ++d) {
        double freq = rng.uniform(1.0, 8.0);
        double phase = rng.uniform(0.0, kTwoPi);
        spike_train(rng, seq_len, 2.0 * layer_sharpness, spikes);
        Oscillator oc(kTwoPi * freq * dt, phase);
        for (int s = 0; s < seq_len; ++s) {
            double carrier = (seq_len > 1 && s == seq_len - 1)
                                 ? std::sin(kTwoPi * freq + phase)
                                 : oc.next();
            double v =
                carrier_amp * carrier + 0.8 * spikes[s] + rng.gauss() * noise_amp;
            v_out[(size_t)s * head_dim + d] = static_cast<float>(v);
        }
    }
    delete[] spikes;
}

// Hard-mode values for a whole layer, one thread per head (streams seeded
// base_seed + head, matching synthetic.py's hard-values offset scheme).
void synth_hard_values_layer(uint32_t base_seed, int num_heads, int seq_len,
                             int head_dim, double layer_sharpness,
                             double carrier_amp, double noise_amp,
                             float* v_out) {
    std::vector<std::thread> workers;
    const size_t head_elems = (size_t)seq_len * head_dim;
    for (int h = 0; h < num_heads; ++h) {
        workers.emplace_back([=]() {
            synth_hard_values(base_seed + h, seq_len, head_dim,
                              layer_sharpness, carrier_amp, noise_amp,
                              v_out + h * head_elems);
        });
    }
    for (auto& w : workers) w.join();
}

// RNG self-test hooks (bit-parity assertions from Python).
void rng_doubles(uint32_t seed, int n, double* out) {
    LegacyRandomState rng(seed);
    for (int i = 0; i < n; ++i) out[i] = rng.random_sample();
}

void rng_randints(uint32_t seed, long lo, long hi, int n, long* out) {
    LegacyRandomState rng(seed);
    for (int i = 0; i < n; ++i) out[i] = rng.randint(lo, hi);
}

void rng_gauss(uint32_t seed, int n, double* out) {
    LegacyRandomState rng(seed);
    for (int i = 0; i < n; ++i) out[i] = rng.gauss();
}

}  // extern "C"
