// Lock-free sensor-frame ring buffer with in-place preprocessing.
//
// Native runtime piece of the perception path: the reference deployment runs a
// ROS2 C++ node feeding images into the controller with staleness watchdogs
// (reference README.md:208-257, timeout_img; SURVEY.md §5.3).  This module
// provides the equivalent host-side ingestion for this framework: a
// single-producer/single-consumer ring where the sensor thread pushes raw
// uint16 depth frames (mm) and the control loop fetches the latest frame
// already converted to the dmax-normalized float32 range image the VAE
// expects (ClipDistance + Depth2Range fused, preprocessing.py semantics) —
// no Python in the producer path, no GIL contention, no allocation per frame.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 frame_ring.cpp -o libframe_ring.so
// Bound via ctypes (sdf_nmpc_tpu/runtime/native.py).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Slot {
    std::vector<float> data;      // preprocessed frame (H*W float32)
    double timestamp = -1.0;
};

struct FrameRing {
    int height = 0;
    int width = 0;
    int capacity = 0;
    float dmax_units = 1.0f;      // dmax expressed in raw pixel units
    std::vector<float> range_map; // per-pixel depth->range factor (or empty)
    std::vector<Slot> slots;
    std::atomic<uint64_t> seq{0}; // count of completed pushes
    std::atomic<uint64_t> drops{0};
};

}  // namespace

extern "C" {

// dmax [m]; mm_resolution: millimetres per raw pixel unit step such that
// raw * mm_resolution / 1000 = metres (reference ClipDistance semantics:
// normalized = raw / (dmax * 1000 / mm_resolution)).
void* frame_ring_create(int height, int width, int capacity, double dmax,
                        double mm_resolution, double hfov, double vfov,
                        int is_depth) {
    auto* ring = new FrameRing();
    ring->height = height;
    ring->width = width;
    ring->capacity = capacity;
    ring->dmax_units = static_cast<float>(dmax * 1000.0 / mm_resolution);
    ring->slots.resize(capacity);
    for (auto& s : ring->slots) s.data.resize(static_cast<size_t>(height) * width);

    if (is_depth) {
        // Depth2Range factor sqrt(1 + tan_h^2 + tan_v^2) per pixel
        // (reference preprocessing.py Depth2Range:5-31)
        ring->range_map.resize(static_cast<size_t>(height) * width);
        const double th = std::tan(hfov);
        const double tv = std::tan(vfov);
        for (int v = 0; v < height; ++v) {
            for (int u = 0; u < width; ++u) {
                const double y = th * (1.0 - 2.0 * u / width);
                const double z = tv * (1.0 - 2.0 * v / height);
                ring->range_map[static_cast<size_t>(v) * width + u] =
                    static_cast<float>(std::sqrt(1.0 + y * y + z * z));
            }
        }
    }
    return ring;
}

void frame_ring_destroy(void* handle) {
    delete static_cast<FrameRing*>(handle);
}

// Producer: push a raw uint16 frame (row-major H*W).  Converts to the
// dmax-normalized float32 range image in place.  Never blocks; overwrites the
// oldest slot (latest-wins semantics — the controller only ever wants the
// newest observation).
void frame_ring_push_u16(void* handle, const uint16_t* raw, double timestamp) {
    auto* ring = static_cast<FrameRing*>(handle);
    const uint64_t s = ring->seq.load(std::memory_order_relaxed);
    Slot& slot = ring->slots[s % ring->capacity];

    const size_t n = static_cast<size_t>(ring->height) * ring->width;
    const float inv = 1.0f / ring->dmax_units;
    float* dst = slot.data.data();
    if (!ring->range_map.empty()) {
        const float* rm = ring->range_map.data();
        for (size_t i = 0; i < n; ++i) {
            float v = static_cast<float>(raw[i]) * inv * rm[i];
            dst[i] = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
        }
    } else {
        for (size_t i = 0; i < n; ++i) {
            float v = static_cast<float>(raw[i]) * inv;
            dst[i] = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
        }
    }
    slot.timestamp = timestamp;
    ring->seq.store(s + 1, std::memory_order_release);
}

// Same producer path for float32 input already in metres.
void frame_ring_push_f32(void* handle, const float* raw_m, double timestamp,
                         double dmax) {
    auto* ring = static_cast<FrameRing*>(handle);
    const uint64_t s = ring->seq.load(std::memory_order_relaxed);
    Slot& slot = ring->slots[s % ring->capacity];
    const size_t n = static_cast<size_t>(ring->height) * ring->width;
    const float inv = 1.0f / static_cast<float>(dmax);
    float* dst = slot.data.data();
    if (!ring->range_map.empty()) {
        const float* rm = ring->range_map.data();
        for (size_t i = 0; i < n; ++i) {
            float v = raw_m[i] * inv * rm[i];
            dst[i] = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
        }
    } else {
        for (size_t i = 0; i < n; ++i) {
            float v = raw_m[i] * inv;
            dst[i] = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
        }
    }
    slot.timestamp = timestamp;
    ring->seq.store(s + 1, std::memory_order_release);
}

// Consumer: copy out the latest complete frame.  Returns the frame timestamp,
// or -1.0 if no frame has ever been pushed.  now/timeout implement the
// staleness watchdog (reference timeout_img): if now - timestamp > timeout the
// return value is still the timestamp but *stale* is set.
double frame_ring_latest(void* handle, float* out, double now, double timeout,
                         int* stale) {
    auto* ring = static_cast<FrameRing*>(handle);
    uint64_t s = ring->seq.load(std::memory_order_acquire);
    if (s == 0) {
        if (stale) *stale = 1;
        return -1.0;
    }
    const size_t n = static_cast<size_t>(ring->height) * ring->width;
    // retry loop: a push may overwrite the slot we are copying (SPSC with
    // latest-wins; with capacity >= 2 one retry suffices at sensor rates)
    for (int attempt = 0; attempt < 4; ++attempt) {
        const uint64_t latest = s - 1;
        const Slot& slot = ring->slots[latest % ring->capacity];
        const double ts = slot.timestamp;
        std::memcpy(out, slot.data.data(), n * sizeof(float));
        const uint64_t s2 = ring->seq.load(std::memory_order_acquire);
        if (s2 - latest <= ring->capacity - 1) {  // slot not overwritten mid-copy
            if (stale) *stale = (now - ts > timeout) ? 1 : 0;
            return ts;
        }
        s = s2;
        ring->drops.fetch_add(1, std::memory_order_relaxed);
    }
    if (stale) *stale = 1;
    return -1.0;
}

uint64_t frame_ring_count(void* handle) {
    return static_cast<FrameRing*>(handle)->seq.load(std::memory_order_relaxed);
}

uint64_t frame_ring_drops(void* handle) {
    return static_cast<FrameRing*>(handle)->drops.load(std::memory_order_relaxed);
}

}  // extern "C"
