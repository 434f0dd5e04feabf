// Native codec for bit-packed quantized SIREN checkpoints.
//
// C++ twin of io/quantized.py:pack_codes/unpack_codes — the host-side hot
// loop of quantized-checkpoint serving (loading a full 512-network cache
// replacement decodes ~85M int codes; the numpy path materializes a
// (size, bits) uint8 matrix per tensor, this walks the bit stream once).
// Layout contract (bit-exact with the numpy path, asserted by
// tests/test_native_qcodec.py): value i's (code + qmax) occupies bits
// [i*bits, (i+1)*bits) of a little-endian bitstream — bit k of the stream
// is bit (k % 8) of byte (k / 8) — with the final byte zero-padded.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 qcodec.cpp -o build/qcodec.so
// (done on demand by native/__init__.py:load_qcodec).

#include <cstdint>
#include <cstring>

extern "C" {

// codes: n symmetric ints in [-qmax, qmax], qmax = 2^(bits-1) - 1.
// out: ceil(n*bits/8) bytes, caller-zeroed or not (fully overwritten).
void pack_codes(const int8_t* codes, long n, int bits, uint8_t* out) {
    const int qmax = (1 << (bits - 1)) - 1;
    if (bits == 8) {
        for (long i = 0; i < n; ++i)
            out[i] = static_cast<uint8_t>(static_cast<int16_t>(codes[i]) + qmax);
        return;
    }
    const long nbytes = (n * bits + 7) / 8;
    std::memset(out, 0, static_cast<size_t>(nbytes));
    uint32_t acc = 0;  // bit accumulator, LSB-first
    int nacc = 0;
    long o = 0;
    for (long i = 0; i < n; ++i) {
        const uint32_t u =
            static_cast<uint32_t>(static_cast<int16_t>(codes[i]) + qmax);
        acc |= u << nacc;
        nacc += bits;
        while (nacc >= 8) {
            out[o++] = static_cast<uint8_t>(acc & 0xFF);
            acc >>= 8;
            nacc -= 8;
        }
    }
    if (nacc > 0) out[o] = static_cast<uint8_t>(acc & 0xFF);
}

// packed: the stream pack_codes produced. out: n int8 codes.
void unpack_codes(const uint8_t* packed, long n, int bits, int8_t* out) {
    const int qmax = (1 << (bits - 1)) - 1;
    if (bits == 8) {
        for (long i = 0; i < n; ++i)
            out[i] = static_cast<int8_t>(
                static_cast<int16_t>(packed[i]) - qmax);
        return;
    }
    const uint32_t mask = (1u << bits) - 1u;
    uint32_t acc = 0;
    int nacc = 0;
    long p = 0;
    for (long i = 0; i < n; ++i) {
        while (nacc < bits) {
            acc |= static_cast<uint32_t>(packed[p++]) << nacc;
            nacc += 8;
        }
        out[i] = static_cast<int8_t>(
            static_cast<int16_t>(acc & mask) - qmax);
        acc >>= bits;
        nacc -= bits;
    }
}

}  // extern "C"
