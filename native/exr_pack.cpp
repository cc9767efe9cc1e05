// Native hot path for the EXR scanline codec (deepdenoiser_tpu/data/exr_codec.py).
//
// The Python codec is numpy-vectorized, but the OpenEXR ZIP pre/post
// processing (byte interleave-split + delta predictor) is inherently
// sequential per byte on the predictor pass and costs several array
// round-trips in numpy. These C implementations do each direction in one
// pass over the buffer. Compression itself stays in zlib (already C).
//
// Exposed via ctypes (deepdenoiser_tpu/data/_native.py); the numpy path
// remains as the reference implementation and fallback.
//
// Build: make -C native   (produces native/libexr_pack.so)

#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// OpenEXR ZIP "compress" preprocessing:
//   1) interleave-split: even-index bytes to the first half, odd to the second
//   2) delta predictor: d[0] = t[0]; d[i] = t[i] - t[i-1] + 128  (mod 256)
// dst and src must not alias; n may be odd.
void exr_split_and_predict(const uint8_t* src, uint8_t* dst, size_t n) {
    if (n == 0) return;
    const size_t half = (n + 1) / 2;
    // split
    for (size_t i = 0, j = 0; j < half; i += 2, ++j) dst[j] = src[i];
    for (size_t i = 1, j = half; j < n; i += 2, ++j) dst[j] = src[i];
    // predict in place (walk backwards so each original byte is still there)
    uint8_t prev = dst[0];
    for (size_t i = 1; i < n; ++i) {
        const uint8_t cur = dst[i];
        dst[i] = static_cast<uint8_t>(cur - prev + 128u);
        prev = cur;
    }
}

// Inverse: undo predictor, then merge halves back into interleaved order.
void exr_unpredict_and_merge(const uint8_t* src, uint8_t* dst, size_t n) {
    if (n == 0) return;
    const size_t half = (n + 1) / 2;
    // unpredict into a stack/heap scratch embedded in dst layout:
    // first reconstruct the linear (split) byte stream into dst temporarily.
    // raw[0] = src[0]; raw[i] = raw[i-1] + src[i] - 128
    uint8_t prev = src[0];
    dst[0] = prev;  // temporarily linear; merged below via second pass copy
    // We need a scratch; to stay allocation-free, reconstruct into the ODD
    // positions trick is unsafe — use a small heap buffer instead.
    // (n is at most a few MB per scanline block; allocation cost is fine.)
    uint8_t* tmp = new uint8_t[n];
    tmp[0] = prev;
    for (size_t i = 1; i < n; ++i) {
        prev = static_cast<uint8_t>(prev + src[i] - 128u);
        tmp[i] = prev;
    }
    // merge: first half -> even positions, second half -> odd positions
    for (size_t i = 0, j = 0; j < half; i += 2, ++j) dst[i] = tmp[j];
    for (size_t i = 1, j = half; j < n; i += 2, ++j) dst[i] = tmp[j];
    delete[] tmp;
}

// Gather one scanline block's rows into the packed (channel-major within
// scanline) layout: for each line, for each channel (alphabetical order),
// width*pixel_size bytes. `srcs` are per-channel row-major planes.
// sizes[] is bytes per pixel per channel.
void exr_pack_block(const uint8_t** srcs, size_t n_channels,
                    const size_t* row_bytes, size_t src_stride_rows,
                    size_t row0, size_t n_rows, uint8_t* dst) {
    size_t off = 0;
    for (size_t r = 0; r < n_rows; ++r) {
        for (size_t c = 0; c < n_channels; ++c) {
            const uint8_t* src = srcs[c] + (row0 + r) * row_bytes[c];
            std::memcpy(dst + off, src, row_bytes[c]);
            off += row_bytes[c];
        }
    }
    (void)src_stride_rows;
}

// Scatter a packed block back into per-channel planes.
void exr_unpack_block(const uint8_t* src, size_t n_channels,
                      const size_t* row_bytes, size_t row0, size_t n_rows,
                      uint8_t** dsts) {
    size_t off = 0;
    for (size_t r = 0; r < n_rows; ++r) {
        for (size_t c = 0; c < n_channels; ++c) {
            uint8_t* dst = dsts[c] + (row0 + r) * row_bytes[c];
            std::memcpy(dst, src + off, row_bytes[c]);
            off += row_bytes[c];
        }
    }
}

}  // extern "C"
