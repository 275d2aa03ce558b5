// Lock-free single-producer/single-consumer frame ring buffer.
//
// The reference hides transfer latency with double buffering: an in-flight
// depth readback flag (IEExecutor.cs:205,351) and a front/backup point
// buffer (IEExecutor.cs:181-185). Our streaming runtime generalizes that to
// an N-slot SPSC ring between the frame producer (camera/file feeder
// thread) and the consumer (device-dispatch loop): the producer overwrites
// nothing in flight, the consumer always takes the freshest complete frame,
// and neither side ever blocks on a mutex on the hot path.
//
// C ABI for ctypes. One ring per stream; slots are fixed-size byte blobs
// (frame + small header the Python side packs).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct Ring {
  uint8_t* data = nullptr;
  int64_t slot_bytes = 0;
  int32_t capacity = 0;
  // SPSC cursors. head = next write, tail = next read.
  alignas(64) std::atomic<int64_t> head{0};
  alignas(64) std::atomic<int64_t> tail{0};
  // drop counter: producer overwrote unread frames (consumer too slow).
  alignas(64) std::atomic<int64_t> dropped{0};
};

}  // namespace

extern "C" {

void* xrseg_ring_create(int32_t capacity, int64_t slot_bytes) {
  if (capacity < 2 || slot_bytes <= 0) return nullptr;
  Ring* r = new (std::nothrow) Ring();
  if (!r) return nullptr;
  r->data = new (std::nothrow) uint8_t[capacity * slot_bytes];
  if (!r->data) {
    delete r;
    return nullptr;
  }
  r->slot_bytes = slot_bytes;
  r->capacity = capacity;
  return r;
}

void xrseg_ring_destroy(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  if (!r) return;
  delete[] r->data;
  delete r;
}

// Producer: push a frame. Never blocks; if the ring is full the OLDEST
// unread frame is dropped (freshness beats completeness for live streams —
// the reference likewise drops camera frames while inference is busy,
// IEPassthroughTrigger.cs:67 gates on IsRunning).
int32_t xrseg_ring_push(void* ring, const uint8_t* frame, int64_t nbytes) {
  Ring* r = static_cast<Ring*>(ring);
  if (!r || nbytes > r->slot_bytes) return -1;
  int64_t head = r->head.load(std::memory_order_relaxed);
  int64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= r->capacity) {
    // full: advance tail (drop oldest). Safe for SPSC with a single
    // producer because the consumer re-validates its read below. Count the
    // drop ONLY if our CAS won — if the consumer popped concurrently, no
    // frame was actually lost.
    if (r->tail.compare_exchange_strong(tail, tail + 1,
                                        std::memory_order_acq_rel)) {
      r->dropped.fetch_add(1, std::memory_order_relaxed);
    }
  }
  std::memcpy(r->data + (head % r->capacity) * r->slot_bytes, frame, nbytes);
  r->head.store(head + 1, std::memory_order_release);
  return 0;
}

// Consumer: pop the OLDEST available frame into out. Returns 1 on success,
// 0 if empty.
int32_t xrseg_ring_pop(void* ring, uint8_t* out, int64_t nbytes) {
  Ring* r = static_cast<Ring*>(ring);
  if (!r || nbytes > r->slot_bytes) return -1;
  for (;;) {
    int64_t tail = r->tail.load(std::memory_order_relaxed);
    int64_t head = r->head.load(std::memory_order_acquire);
    if (tail >= head) return 0;
    std::memcpy(out, r->data + (tail % r->capacity) * r->slot_bytes, nbytes);
    // claim the slot; if the producer advanced tail underneath us (overwrite
    // race), retry with the new tail.
    if (r->tail.compare_exchange_strong(tail, tail + 1,
                                        std::memory_order_acq_rel)) {
      return 1;
    }
  }
}

// Consumer: pop the NEWEST frame, discarding older ones (live-view mode).
int32_t xrseg_ring_pop_latest(void* ring, uint8_t* out, int64_t nbytes) {
  Ring* r = static_cast<Ring*>(ring);
  if (!r || nbytes > r->slot_bytes) return -1;
  for (;;) {
    int64_t head = r->head.load(std::memory_order_acquire);
    int64_t tail = r->tail.load(std::memory_order_relaxed);
    if (tail >= head) return 0;
    int64_t newest = head - 1;
    std::memcpy(out, r->data + (newest % r->capacity) * r->slot_bytes,
                nbytes);
    // drop everything up to and including `newest` if unchanged
    if (r->tail.compare_exchange_strong(tail, newest + 1,
                                        std::memory_order_acq_rel)) {
      return 1;
    }
  }
}

int64_t xrseg_ring_size(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  if (!r) return -1;
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

int64_t xrseg_ring_dropped(void* ring) {
  Ring* r = static_cast<Ring*>(ring);
  return r ? r->dropped.load(std::memory_order_relaxed) : -1;
}

}  // extern "C"
