// Native host-side audio runtime for audio_denoising_tpu.
//
// The reference delegates its host natives to library code (PyAV/FFmpeg C
// for decode, PortAudio for capture — SURVEY §2); the TPU framework's
// equivalents are implemented here and exposed through a C ABI consumed via
// ctypes (no pybind11 in this environment). Everything is allocation-free
// on the hot path and operates on caller-owned buffers.
//
// Components:
//   - PCM <-> float32 conversion (int8/16/24/32 widths, reference scaling
//     rules utils.py:109-116), with clipping on the encode side
//     (app2.py:246-247 semantics).
//   - Interleaved <-> planar deinterleaving for multichannel WAV frames.
//   - StreamChunker: fixed-size re-chunking with residue carry — the
//     reference's buffer_stream contract (utils.py:221-269) as a ring
//     buffer with O(1) push/pop, used by the serving daemons' ingest path.
//   - Peak scan + mixture synthesis (combine_audio, utils.py:363-372).
//
// Build: see native/build.sh (g++ -O3 -shared). Loaded lazily by
// audio_denoising_tpu/io/native.py; every entry point has a numpy fallback.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PCM conversion
// ---------------------------------------------------------------------------

void adt_pcm16_to_f32(const int16_t* in, float* out, int64_t n) {
    constexpr float kScale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kScale;
}

void adt_pcm8_to_f32(const int8_t* in, float* out, int64_t n) {
    constexpr float kScale = 1.0f / 128.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kScale;
}

void adt_pcm32_to_f32(const int32_t* in, float* out, int64_t n) {
    constexpr double kScale = 1.0 / 2147483648.0;
    for (int64_t i = 0; i < n; ++i)
        out[i] = static_cast<float>(in[i] * kScale);
}

// 24-bit little-endian packed -> float32
void adt_pcm24_to_f32(const uint8_t* in, float* out, int64_t n) {
    constexpr double kScale = 1.0 / 8388608.0;  // 2^23
    for (int64_t i = 0; i < n; ++i) {
        int32_t v = static_cast<int32_t>(in[3 * i]) |
                    (static_cast<int32_t>(in[3 * i + 1]) << 8) |
                    (static_cast<int32_t>(in[3 * i + 2]) << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        out[i] = static_cast<float>(v * kScale);
    }
}

// float32 -> int16 with clipping (reference app2.py:246-247)
void adt_f32_to_pcm16(const float* in, int16_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
        out[i] = static_cast<int16_t>(v * 32767.0f);
    }
}

// interleaved (n, ch) -> planar (ch, n)
void adt_deinterleave_f32(const float* in, float* out, int64_t n,
                          int64_t channels) {
    for (int64_t c = 0; c < channels; ++c) {
        const float* src = in + c;
        float* dst = out + c * n;
        for (int64_t i = 0; i < n; ++i) dst[i] = src[i * channels];
    }
}

void adt_interleave_f32(const float* in, float* out, int64_t n,
                        int64_t channels) {
    for (int64_t c = 0; c < channels; ++c) {
        const float* src = in + c * n;
        float* dst = out + c;
        for (int64_t i = 0; i < n; ++i) dst[i * channels] = src[i];
    }
}

// ----------------------------------------------------------------------------
// Peak scan / mixture synthesis
// ----------------------------------------------------------------------------

float adt_peak_f32(const float* in, int64_t n) {
    float peak = 0.0f;
    for (int64_t i = 0; i < n; ++i) {
        float a = in[i] < 0 ? -in[i] : in[i];
        if (a > peak) peak = a;
    }
    return peak;
}

// out = clip(a + b, -1, 1)  (combine_audio, utils.py:368-372)
void adt_combine_f32(const float* a, const float* b, float* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = a[i] + b[i];
        out[i] = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
    }
}

// ---------------------------------------------------------------------------
// StreamChunker: residue-carry re-chunking ring
// ---------------------------------------------------------------------------

struct StreamChunker {
    std::vector<float> buf;
    int64_t head = 0;   // read position
    int64_t size = 0;   // valid samples
    int64_t chunk = 0;

    explicit StreamChunker(int64_t chunk_size, int64_t capacity)
        : buf(static_cast<size_t>(std::max<int64_t>(capacity, chunk_size * 4))),
          chunk(chunk_size) {}
};

void* adt_chunker_new(int64_t chunk_size, int64_t capacity) {
    return new StreamChunker(chunk_size, capacity);
}

void adt_chunker_free(void* h) {
    delete static_cast<StreamChunker*>(h);
}

int64_t adt_chunker_size(void* h) {
    return static_cast<StreamChunker*>(h)->size;
}

// Append n samples; grows the ring if needed. Returns number of full
// chunks now available.
int64_t adt_chunker_push(void* h, const float* in, int64_t n) {
    auto* c = static_cast<StreamChunker*>(h);
    int64_t cap = static_cast<int64_t>(c->buf.size());
    if (c->size + n > cap) {
        int64_t new_cap = cap;
        while (c->size + n > new_cap) new_cap *= 2;
        std::vector<float> nb(static_cast<size_t>(new_cap));
        for (int64_t i = 0; i < c->size; ++i)
            nb[i] = c->buf[(c->head + i) % cap];
        c->buf.swap(nb);
        c->head = 0;
        cap = new_cap;
    }
    int64_t tail = (c->head + c->size) % cap;
    int64_t first = std::min(n, cap - tail);
    std::memcpy(c->buf.data() + tail, in, first * sizeof(float));
    if (n > first)
        std::memcpy(c->buf.data(), in + first, (n - first) * sizeof(float));
    c->size += n;
    return c->size / c->chunk;
}

// Pop one chunk into out; returns 1 on success, 0 if not enough data.
int32_t adt_chunker_pop(void* h, float* out) {
    auto* c = static_cast<StreamChunker*>(h);
    if (c->size < c->chunk) return 0;
    int64_t cap = static_cast<int64_t>(c->buf.size());
    int64_t first = std::min(c->chunk, cap - c->head);
    std::memcpy(out, c->buf.data() + c->head, first * sizeof(float));
    if (c->chunk > first)
        std::memcpy(out + first, c->buf.data(),
                    (c->chunk - first) * sizeof(float));
    c->head = (c->head + c->chunk) % cap;
    c->size -= c->chunk;
    return 1;
}

}  // extern "C"
