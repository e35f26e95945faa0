// Native detailed-timing scheduler for sanafe_tpu.
//
// Implements the semi-analytical NoC congestion sweep of the reference
// simulator (SLAM-Lab/SANA-FE src/schedule.cpp:208-611) as a standalone C
// library consumed from Python via ctypes. The device kernel streams per-chunk
// fired-axon bitmaps and per-neuron generation latencies; this library
// reconstructs each timestep's per-core message lists and runs the exact
// serial event sweep per timestep. Timesteps are independent (the tracked NoC
// state resets each timestep), so the chunk is parallelized across timesteps
// with OpenMP -- the TPU-era replacement for the reference's pipelined
// scheduler threads (src/schedule.hpp:47-167).
//
// This is a from-scratch implementation of the published algorithm; no code
// is copied from the reference.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <mutex>
#include <optional>
#include <queue>
#include <vector>

#if defined(__linux__)
#include <sys/mman.h>
#endif

#include "cycle_noc.h"
#if defined(__AVX512F__)
#include <immintrin.h>
#endif

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Allocator that backs large blocks with transparent hugepages. The
// sweep's per-axon tables (AxonHot ~9 MB, route CSR ~5 MB at DVS scale)
// are read in data-dependent order, a line or two per message — with
// 4 KiB pages that adds a dTLB miss on top of each cache miss. 2 MiB
// pages cut the table's page count from thousands to a handful.
template <typename T>
struct HugeAlloc {
    using value_type = T;
    static constexpr size_t kHuge = size_t(1) << 21;
    HugeAlloc() = default;
    template <typename U>
    HugeAlloc(const HugeAlloc<U> &) {}
    T *allocate(size_t n) {
        const size_t bytes = n * sizeof(T);
        if (bytes >= kHuge) {
            const size_t padded = (bytes + kHuge - 1) & ~(kHuge - 1);
            void *p = nullptr;
            if (posix_memalign(&p, kHuge, padded) == 0) {
#if defined(__linux__) && defined(MADV_HUGEPAGE)
                madvise(p, padded, MADV_HUGEPAGE);
#endif
                return static_cast<T *>(p);
            }
        }
        return static_cast<T *>(::operator new(bytes));
    }
    void deallocate(T *p, size_t n) {
        if (n * sizeof(T) >= kHuge) {
            std::free(p);
        } else {
            ::operator delete(p);
        }
    }
    template <typename U>
    bool operator==(const HugeAlloc<U> &) const {
        return true;
    }
    template <typename U>
    bool operator!=(const HugeAlloc<U> &) const {
        return false;
    }
};

template <typename T>
using HugeVec = std::vector<T, HugeAlloc<T>>;

constexpr int kNorth = 0;
constexpr int kEast = 1;
constexpr int kSouth = 2;
constexpr int kWest = 3;
constexpr int kNDir = 4;

struct ChipLayout {
    // NoC
    int noc_w = 1;
    int noc_h = 1;
    int links_per_tile = kNDir;
    int buffer_size = 0;
    int n_cores = 0;
    int n_axons = 0;
    int n_neurons = 0;
    // True when every proc_delay >= 0, which makes recv_ts nondecreasing
    // within each dest core's fleet (recv = max(fin, earliest) and
    // fin' = recv + proc), so retirement only ever pops fleet FRONTS.
    bool monotone_recv = true;
    // per-axon (size n_axons)
    HugeVec<int32_t> src_slot, src_core, dest_core;
    HugeVec<int32_t> src_x, src_y, dest_x, dest_y;
    HugeVec<int32_t> src_core_offset, hops, ordinal;
    HugeVec<double> latency_out, proc_delay, min_hop_delay;
    // per-core (size n_cores): global slot range [slot_lo, slot_hi]
    std::vector<int32_t> core_slot_lo, core_slot_hi;
    std::vector<int32_t> core_tile_x, core_tile_y, core_offset;
    // per-core list of axon ids sourced from that core, ascending
    std::vector<int32_t> core_axon_start;  // size n_cores+1 into core_axons
    HugeVec<int32_t> core_axons;
    // per-slot axon ranges: axons of slot s are [slot_axon_start[s],
    // slot_axon_start[s+1]) in axon-id order (axon ids are slot-major)
    HugeVec<int32_t> slot_axon_start;  // size n_neurons+1
    // per-neuron generation-latency components (float64 parity with the
    // reference's accumulation in process_neuron, src/chip.cpp:710-736):
    // lat(n) = base[n] + updated(n)*update[n] + fired(n)*spike[n]
    HugeVec<double> lat_base, lat_update, lat_spike;
    // per-axon cached DOR route links (CSR) + density adjust 1/(2+hops)
    HugeVec<int32_t> route_start;  // size n_axons+1
    HugeVec<int32_t> route_links;
    HugeVec<double> density_adjust;
    // density adjust indexed by path_capacity_hops (= hops+1):
    // adj_by_cap[h+1] == 1/(2+h) == density_adjust[a]. Lets MsgLite and
    // FleetLite carry a 1-byte cap_hops instead of an 8-byte double.
    std::vector<double> adj_by_cap;
    // True when every per-axon field fits the narrow MsgLite encoding
    // (dest < 2^15, route_len and hops+1 < 2^8); always true for real
    // meshes (the reference caps at 8x4 tiles), checked at build time.
    bool lite_fields_ok = true;
    // Hot per-axon constants packed into one cache line each: the sweep
    // touches ~6 per-axon arrays per message (each ~1.8 MB at DVS scale,
    // far beyond L2), so the scattered loads were one cache miss PER
    // ARRAY; packing makes it one miss per message.
    struct AxonHot {
        double proc;      // axon_const_processing_latency
        double min_hop;   // min hop delay
        double adj;       // 1/(2+hops)
        double lat_out;   // axon-out send latency (latency_out[a])
        int32_t dest;     // dest core
        int32_t route_off;
        int32_t route_len;
        int32_t path_capacity_hops;  // hops+1 (capacity multiplier)
    };
    HugeVec<AxonHot> hot;
};

// MSB-first bit lookup matching numpy packbits/unpackbits layout.
inline bool get_bit(const uint8_t *bytes, int32_t i) {
    return ((bytes[i >> 3] >> (7 - (i & 7))) & 1) != 0;
}

struct Msg {
    int32_t axon = -1;  // -1 => placeholder
    int32_t src_core = 0;
    int32_t dest_core = -1;
    double gen_delay = 0.0;
    double proc_delay = 0.0;
    double min_hop_delay = 0.0;
    double net_delay = 0.0;
    double block_delay = 0.0;
    double sent_ts = 0.0;
    double recv_ts = 0.0;
    double proc_ts = 0.0;
    double route_density = 0.0;
};

struct HeapEntry {
    double key;
    int64_t seq;
    int32_t core;
    int32_t idx;
    bool operator>(const HeapEntry &o) const {
        if (key != o.key) return key > o.key;
        return seq > o.seq;
    }
};

using MinHeap =
    std::priority_queue<HeapEntry, std::vector<HeapEntry>, std::greater<>>;

// Event heap for the detailed sweep: compares ONLY the sent timestamp,
// byte-matching the reference's CompareMessagesBySentTime
// (src/message.cpp:61-65). Tie ordering is whatever libstdc++'s heap sift
// produces — intentionally NOT stabilized with a sequence number, because
// the reference's results (and its message trace) depend on that order.
struct CmpSentOnly {
    bool operator()(const HeapEntry &a, const HeapEntry &b) const {
        return a.key > b.key;
    }
};
using EventHeap =
    std::priority_queue<HeapEntry, std::vector<HeapEntry>, CmpSentOnly>;

std::vector<ChipLayout *> g_chips;
std::mutex g_chips_mutex;

// Enumerate the links of a message's dimension-order (x then y) route,
// mirroring the reference's noc_get_links (src/schedule.cpp:478-553): the
// first link is the source core's tile-entry link, then E/W links across x,
// then N/S links across y, and finally the destination tile link taken in
// the direction of travel.
template <typename Fn>
inline void for_route_links(const ChipLayout &L, int sx, int sy, int dx,
                            int dy, int src_core_offset, Fn &&fn) {
    const int lpt = L.links_per_tile;
    auto idx = [&](int x, int y, int link) {
        return (x * L.noc_h + y) * lpt + link;
    };
    int x_inc = (sx < dx) ? 1 : -1;
    int y_inc = (sy < dy) ? 1 : -1;
    int prev_dir = kNDir + src_core_offset;
    for (int x = sx; x != dx; x += x_inc) {
        int dir = (x_inc > 0) ? kEast : kWest;
        if (x == sx) {
            fn(idx(x, sy, kNDir + src_core_offset));
        } else {
            fn(idx(x, sy, dir));
        }
        prev_dir = dir;
    }
    for (int y = sy; y != dy; y += y_inc) {
        int dir = (y_inc > 0) ? kNorth : kSouth;
        if (sx == dx && y == sy) {
            fn(idx(dx, y, kNDir + src_core_offset));
        } else {
            fn(idx(dx, y, prev_dir));
        }
        prev_dir = dir;
    }
    if (sx == dx && sy == dy) {
        fn(idx(dx, dy, kNDir + src_core_offset));
    } else {
        fn(idx(dx, dy, prev_dir));
    }
}

// One tracked in-flight message: the queue coordinates of its Msg plus a
// cached copy of its receive time (recv_ts is written once at send and
// never changes, so the cache is always valid; it keeps the retirement
// walk from chasing a pointer into the queues for every comparison).
struct FleetEntry {
    double recv_ts;
    int32_t core;
    int32_t idx;
};

struct NocState {
    std::vector<double> density;
    std::vector<double> core_finished_receiving;
    double mean_in_flight_recv_delay = 0.0;
    int messages_in_noc = 0;
    // In-flight messages per DESTINATION core in arrival (insertion) order:
    // retirement must scan dest cores 0..C-1 and each list front-to-back
    // (noc_update_all_tracked_messages, src/schedule.cpp:380-400) because
    // the rolling-mean updates are order-sensitive in float64.
    // Each list is consumed from `fleet_head` forward; `nonempty` is a
    // bitmask of dest cores with live entries so the retirement walk
    // touches only occupied fleets.
    std::vector<std::vector<FleetEntry>> in_flight;
    std::vector<int32_t> fleet_head;
    std::vector<uint64_t> nonempty;

    explicit NocState(const ChipLayout &L)
        : density(static_cast<size_t>(L.noc_w) * L.noc_h * L.links_per_tile,
                  0.0),
          core_finished_receiving(L.n_cores, 0.0),
          in_flight(L.n_cores),
          fleet_head(L.n_cores, 0),
          nonempty((L.n_cores + 63) / 64, 0) {}
};

inline void update_density(const ChipLayout &L, NocState &noc, const Msg &m,
                           bool entering) {
    const int32_t a = m.axon;
    double adj = L.density_adjust[a];
    if (!entering) adj = -adj;
    for (int32_t i = L.route_start[a]; i < L.route_start[a + 1]; ++i) {
        noc.density[L.route_links[i]] += adj;
    }
}

inline void update_rolling_mean(NocState &noc, const Msg &m, bool entering) {
    // Exact incremental mean of in-flight receive (processing) delays
    // (src/schedule.cpp:449-476).
    if (entering) {
        noc.mean_in_flight_recv_delay +=
            (m.proc_delay - noc.mean_in_flight_recv_delay) /
            (noc.messages_in_noc + 1.0);
        noc.messages_in_noc += 1;
    } else {
        if (noc.messages_in_noc > 1) {
            noc.mean_in_flight_recv_delay +=
                (noc.mean_in_flight_recv_delay - m.proc_delay) /
                (noc.messages_in_noc - 1.0);
        } else {
            noc.mean_in_flight_recv_delay = 0.0;
        }
        noc.messages_in_noc -= 1;
    }
}

// Build the per-core message lists for one timestep from the fired-axon
// bitmap and per-neuron generation latencies (src/chip.cpp:624-654,802-834).
void build_messages(const ChipLayout &L, const uint8_t *fired,
                    const double *gen_lat,
                    std::vector<std::vector<Msg>> &queues) {
    queues.assign(L.n_cores, {});
    for (int core = 0; core < L.n_cores; ++core) {
        const int32_t lo = L.core_slot_lo[core];
        const int32_t hi = L.core_slot_hi[core];
        if (lo < 0) continue;
        auto &q = queues[core];
        double acc = 0.0;
        int32_t next_slot = lo;
        const int32_t a_begin = L.core_axon_start[core];
        const int32_t a_end = L.core_axon_start[core + 1];
        for (int32_t ai = a_begin; ai < a_end; ++ai) {
            const int32_t a = L.core_axons[ai];
            if (!fired[a]) continue;
            if (L.ordinal[a] == 0) {
                const int32_t s = L.src_slot[a];
                for (int32_t j = next_slot; j <= s; ++j) acc += gen_lat[j];
                next_slot = s + 1;
            }
            Msg m;
            m.axon = a;
            m.src_core = core;
            m.dest_core = L.dest_core[a];
            m.gen_delay = acc + L.latency_out[a];
            m.proc_delay = L.proc_delay[a];
            m.min_hop_delay = L.min_hop_delay[a];
            acc = 0.0;
            q.push_back(m);
        }
        double remainder = 0.0;
        for (int32_t j = next_slot; j <= hi; ++j) remainder += gen_lat[j];
        if (remainder != 0.0) {
            Msg m;  // placeholder (mid = -1 in the reference)
            m.axon = -1;
            m.src_core = core;
            m.dest_core = -1;
            m.gen_delay = remainder;
            q.push_back(m);
        }
    }
}

// Packed-mask variant: fired/updated as MSB-first bitmaps over neuron slots.
// Generation latencies are computed on the fly from the registered per-neuron
// latency components, in float64. Walks each core's slot range once
// (matching the reference's per-neuron accumulation order) and expands only
// fired slots into messages via the slot→axon index.
void build_messages_packed(const ChipLayout &L, const uint8_t *fired_bits,
                           const uint8_t *updated_bits,
                           std::vector<std::vector<Msg>> &queues) {
    if (queues.size() != static_cast<size_t>(L.n_cores)) {
        queues.resize(L.n_cores);
    }
    for (auto &q : queues) q.clear();
    for (int core = 0; core < L.n_cores; ++core) {
        const int32_t lo = L.core_slot_lo[core];
        const int32_t hi = L.core_slot_hi[core];
        if (lo < 0) continue;
        auto &q = queues[core];
        double acc = 0.0;
        for (int32_t j = lo; j <= hi; ++j) {
            const bool fired = get_bit(fired_bits, j);
            double lat = L.lat_base[j];
            if (get_bit(updated_bits, j)) lat += L.lat_update[j];
            if (fired) lat += L.lat_spike[j];
            acc += lat;
            if (!fired) continue;
            const int32_t a_begin = L.slot_axon_start[j];
            const int32_t a_end = L.slot_axon_start[j + 1];
            for (int32_t a = a_begin; a < a_end; ++a) {
                Msg m;
                m.axon = a;
                m.src_core = core;
                m.dest_core = L.dest_core[a];
                m.gen_delay = acc + L.latency_out[a];
                m.proc_delay = L.proc_delay[a];
                m.min_hop_delay = L.min_hop_delay[a];
                acc = 0.0;
                q.push_back(m);
            }
        }
        if (acc != 0.0) {
            Msg m;
            m.axon = -1;
            m.src_core = core;
            m.dest_core = -1;
            m.gen_delay = acc;
            q.push_back(m);
        }
    }
}

// ---------------------------------------------------------------------------
// Fast no-trace sweep: same float64 operations in the same order as
// sweep_timestep below (bit-identical sim_time), but with a
// cache-friendly layout — 16-byte messages in one flat buffer, packed
// per-axon constants (ChipLayout::hot), and all scratch reused across
// the chunk's timesteps instead of reallocated per step. Only valid in
// monotone mode (proc delays >= 0; checked by the caller).

// The per-axon constants are EMBEDDED at build time: the builder walks
// axons in ascending order (prefetch-friendly), and the sweep then pops
// messages in data-dependent order — embedding turns ~4 dependent cache
// misses per message (msg -> hot -> routes -> fleet) into ~2, with the
// whole per-step message buffer (~180 KB at DVS scale) L2-resident.
struct MsgLite {
    double gen;
    double proc;
    double min_hop;
    int32_t route_off;
    int16_t dest;        // -1 => placeholder
    uint8_t route_len;
    uint8_t cap_hops;    // hops+1; adj = ChipLayout::adj_by_cap[cap_hops]
};
static_assert(sizeof(MsgLite) == 32,
              "MsgLite must stay two per cache line; the per-step message "
              "buffer streams through L2 once per build and once per sweep");

// In-flight entry with the retirement-relevant fields embedded, so the
// retirement walk reads one sequential 32-byte record per retired
// message instead of chasing an index.
struct FleetLite {
    double recv;
    double proc;
    int32_t route_off;
    uint8_t route_len;
    uint8_t cap_hops;    // adj = ChipLayout::adj_by_cap[cap_hops]
    uint16_t pad_ = 0;
};
static_assert(sizeof(FleetLite) == 24, "keep fleet entries compact");

// 16-byte event-heap entry (HeapEntry carries a seq the lite
// comparator never reads); same CmpSentOnly ordering semantics.
struct LiteEntry {
    double key;
    int32_t core;
    int32_t idx;
};

struct CmpLite {
    bool operator()(const LiteEntry &a, const LiteEntry &b) const {
        return a.key > b.key;
    }
};

struct SweepScratch {
    std::vector<MsgLite> msgs;          // flat, core-major
    std::vector<int32_t> core_begin;    // size n_cores+1
    std::vector<double> density;
    std::vector<double> fin;            // core_finished_receiving
    std::vector<int32_t> heads;
    std::vector<LiteEntry> heap;        // lite_heap_push / lite_heap_pop
    std::vector<std::vector<FleetLite>> fleets;
    std::vector<int32_t> fleet_head;
    std::vector<std::pair<double, int32_t>> head_heap_v;
    std::vector<int32_t> retire_cores;
    std::vector<double> head_recv;
    std::vector<double> block_min;      // min head_recv per 8-core block
    std::vector<double> lat;            // per-slot latency, one step

    void init(const ChipLayout &L) {
        if (static_cast<int32_t>(fin.size()) != L.n_cores ||
        lat.size() != L.lat_base.size()) {
            density.assign(
                static_cast<size_t>(L.noc_w) * L.noc_h * L.links_per_tile,
                0.0);
            fin.assign(L.n_cores, 0.0);
            heads.assign(L.n_cores, 0);
            fleets.assign(L.n_cores, {});
            fleet_head.assign(L.n_cores, 0);
            const size_t hr_pad = (L.n_cores + 7) & ~7;
            head_recv.assign(hr_pad,
                             std::numeric_limits<double>::infinity());
            block_min.assign((hr_pad / 8 + 7) & ~size_t(7),
                             std::numeric_limits<double>::infinity());
            core_begin.assign(L.n_cores + 1, 0);
            lat.assign(L.lat_base.size(), 0.0);
        }
    }
};

// Exact reimplementation of libstdc++'s push_heap / pop_heap over
// LiteEntry with the CmpLite ordering (min-heap on key): the comparison
// SEQUENCE and tie behavior are identical (same pop order, bit-identical
// sweep results), but the sift-down child choice compiles to a branchless
// select — std::pop_heap's 50/50 child branch mispredicts on nearly every
// level of nearly every pop, which dominated its cost here.
inline void lite_heap_push(std::vector<LiteEntry> &h, LiteEntry value) {
    h.push_back(value);  // grow; slot is overwritten by the sift below
    LiteEntry *a = h.data();
    size_t hole = h.size() - 1;
    while (hole > 0) {
        const size_t parent = (hole - 1) / 2;
        if (!(a[parent].key > value.key)) break;
        a[hole] = a[parent];
        hole = parent;
    }
    a[hole] = value;
}

inline LiteEntry lite_heap_pop(std::vector<LiteEntry> &h) {
    LiteEntry *a = h.data();
    const LiteEntry top = a[0];
    const size_t len = h.size() - 1;
    const LiteEntry value = a[len];
    h.pop_back();
    if (len == 0) return top;
    // __adjust_heap: walk the hole to a leaf taking, at each level, the
    // right child unless the left is strictly smaller (ties keep right,
    // matching comp(right, left) == right.key > left.key), then sift the
    // displaced back() value up from the leaf.
    size_t hole = 0;
    size_t sc = 0;
    while (sc < (len - 1) / 2) {
        sc = 2 * (sc + 1);
        sc -= static_cast<size_t>(a[sc].key > a[sc - 1].key);
        a[hole] = a[sc];
        hole = sc;
    }
    if ((len & 1) == 0 && sc == (len - 2) / 2) {
        sc = 2 * (sc + 1);
        a[hole] = a[sc - 1];
        hole = sc - 1;
    }
    while (hole > 0) {
        const size_t parent = (hole - 1) / 2;
        if (!(a[parent].key > value.key)) break;
        a[hole] = a[parent];
        hole = parent;
    }
    a[hole] = value;
    return top;
}

// Bit-reversed byte table: numpy packbits is MSB-first (slot 8k+i is bit
// 7-i of byte k), while AVX-512 mask lanes are LSB-first — rev8[b] swaps
// the bit order so byte k maps directly onto lanes of slot block k.
struct Rev8 {
    uint8_t t[256];
    Rev8() {
        for (int b = 0; b < 256; ++b) {
            uint8_t r = 0;
            for (int i = 0; i < 8; ++i) {
                if (b & (1 << (7 - i))) r |= (1 << i);
            }
            t[b] = r;
        }
    }
};
const Rev8 g_rev8;

// Per-slot generation latency for one timestep, written to s.lat:
// lat[j] = base[j] (+ update[j] if updated) (+ spike[j] if fired) — the
// same two conditional float64 adds, in the same order, as the scalar
// walk (bit-exact). The latency component vectors are padded to a
// multiple of 8 at creation so whole-byte blocks can load safely.
void compute_step_latencies(const ChipLayout &L, const uint8_t *fired_bits,
                            const uint8_t *updated_bits, SweepScratch &s) {
    const size_t n_pad = L.lat_base.size();
    const double *base = L.lat_base.data();
    const double *upd = L.lat_update.data();
    const double *spk = L.lat_spike.data();
    double *out = s.lat.data();
    const size_t n_bytes = n_pad / 8;
#if defined(__AVX512F__)
    for (size_t k = 0; k < n_bytes; ++k) {
        const __mmask8 fm = g_rev8.t[fired_bits[k]];
        const __mmask8 um = g_rev8.t[updated_bits[k]];
        __m512d lat = _mm512_loadu_pd(base + 8 * k);
        lat = _mm512_mask_add_pd(lat, um, lat,
                                 _mm512_loadu_pd(upd + 8 * k));
        lat = _mm512_mask_add_pd(lat, fm, lat,
                                 _mm512_loadu_pd(spk + 8 * k));
        _mm512_storeu_pd(out + 8 * k, lat);
    }
#else
    for (size_t j = 0; j < n_pad; ++j) {
        const int32_t ji = static_cast<int32_t>(j);
        double lat = base[j];
        if (get_bit(updated_bits, ji)) lat += upd[j];
        if (get_bit(fired_bits, ji)) lat += spk[j];
        out[j] = lat;
    }
#endif
}

// Build one timestep's flat message list from the packed masks
// (bit-identical values to build_messages_packed).
void build_messages_lite(const ChipLayout &L, const uint8_t *fired_bits,
                         const uint8_t *updated_bits, SweepScratch &s) {
    s.msgs.clear();
    compute_step_latencies(L, fired_bits, updated_bits, s);
    const double *lat = s.lat.data();
    for (int core = 0; core < L.n_cores; ++core) {
        s.core_begin[core] = static_cast<int32_t>(s.msgs.size());
        const int32_t lo = L.core_slot_lo[core];
        const int32_t hi = L.core_slot_hi[core];
        if (lo < 0) continue;
        double acc = 0.0;
        for (int32_t j = lo; j <= hi; ++j) {
            acc += lat[j];
            if (!get_bit(fired_bits, j)) continue;
            const int32_t a_begin = L.slot_axon_start[j];
            const int32_t a_end = L.slot_axon_start[j + 1];
            for (int32_t a = a_begin; a < a_end; ++a) {
                const ChipLayout::AxonHot &h = L.hot[a];
                s.msgs.push_back(
                    {acc + h.lat_out, h.proc, h.min_hop, h.route_off,
                     static_cast<int16_t>(h.dest),
                     static_cast<uint8_t>(h.route_len),
                     static_cast<uint8_t>(h.path_capacity_hops)});
                acc = 0.0;
            }
        }
        if (acc != 0.0) {
            s.msgs.push_back({acc, 0.0, 0.0, 0, -1, 0, 0});
        }
    }
    s.core_begin[L.n_cores] = static_cast<int32_t>(s.msgs.size());
}

// The lite sweep as an explicit state machine: start() seeds the event
// heap, advance() processes exactly one heap pop (the full body of the
// former while-loop, same float64 operations in the same order — still
// bit-identical to sweep_timestep). The split exists so several
// independent timesteps' sweeps can interleave advance() calls in one
// loop (sweep_timestep_lite_group below): each sweep is a long serial
// dependence chain stalling on data-dependent L2 loads, and the
// out-of-order core overlaps the chains' stalls.

// Section cycle counters for the profiled sweep instantiation
// (sched_sweep_profile). kProf=false compiles them out entirely — the
// production sweep binary is unchanged.
struct SweepProfCounters {
    uint64_t pop = 0, retire = 0, send = 0, push = 0;
    uint64_t events = 0, retire_calls = 0, drains = 0;
    void reset() { *this = SweepProfCounters{}; }
};
inline SweepProfCounters g_sweep_prof;

#if defined(__x86_64__)
#include <x86intrin.h>
inline uint64_t prof_tsc() { return __rdtsc(); }
#else
inline uint64_t prof_tsc() { return 0; }
#endif

template <bool kProf = false>
struct LiteSweepT {
    const ChipLayout &L;
    SweepScratch &s;
    double mean = 0.0;
    double last_ts = 0.0;
    double retire_lb = std::numeric_limits<double>::infinity();
    int in_noc = 0;

    static constexpr double kInf = std::numeric_limits<double>::infinity();

    LiteSweepT(const ChipLayout &chip, SweepScratch &scratch)
        : L(chip), s(scratch) {}

    inline void push_next(int core, double base) {
        const int32_t i = s.heads[core]++;
        // the message's route links will be walked when it pops (usually
        // many iterations from now) -- start the line toward L1 now
        __builtin_prefetch(&L.route_links[s.msgs[i].route_off]);
        const double sent = base + s.msgs[i].gen;
        lite_heap_push(s.heap, {sent, static_cast<int32_t>(core), i});
        if (sent > last_ts) last_ts = sent;
    }

    // head_recv[core] changed: refresh its 8-core block minimum (the
    // retire scan reads only block minima; see retire()).
    inline void refresh_block(int core) {
#if defined(__AVX512F__)
        const int b = core >> 3;
        const __m512d v = _mm512_loadu_pd(s.head_recv.data() + 8 * b);
        s.block_min[b] = _mm512_reduce_min_pd(v);
#else
        (void)core;
#endif
    }

    void start() {
        s.init(L);
        std::fill(s.density.begin(), s.density.end(), 0.0);
        std::fill(s.fin.begin(), s.fin.end(), 0.0);
        const int n_cores = L.n_cores;
        for (int c = 0; c < n_cores; ++c) {
            s.heads[c] = s.core_begin[c];
            s.fleets[c].clear();
            s.fleet_head[c] = 0;
            s.head_recv[c] = kInf;
        }
        std::fill(s.block_min.begin(), s.block_min.end(), kInf);
        s.heap.clear();
        for (int core = 0; core < n_cores; ++core) {
            if (s.core_begin[core] < s.core_begin[core + 1]) {
                push_next(core, 0.0);
            }
        }
    }

    bool live() const { return !s.heap.empty(); }

    // Pops every due message off one core's fleet. Does NOT refresh the
    // core's 8-core block minimum — callers batch that per touched block
    // (retire()) or per insert (advance()), so a retire event that drains
    // several cores of one block pays one AVX refresh, not one per core.
    inline void drain_core(int core, double sent_ts) {
        double *hr = s.head_recv.data();
        auto &fleet = s.fleets[core];
        int32_t &head = s.fleet_head[core];
        const int32_t size = static_cast<int32_t>(fleet.size());
        while (head < size && sent_ts >= fleet[head].recv) {
            if (kProf) g_sweep_prof.drains += 1;
            const FleetLite &fe = fleet[head];
            const double radj = -L.adj_by_cap[fe.cap_hops];
            const int32_t *lp = &L.route_links[fe.route_off];
            for (int32_t k = 0; k < fe.route_len; ++k) {
                s.density[lp[k]] += radj;
            }
            if (in_noc > 1) {
                mean += (mean - fe.proc) / (in_noc - 1.0);
            } else {
                mean = 0.0;
            }
            in_noc -= 1;
            ++head;
        }
        if (head >= size) {
            fleet.clear();
            head = 0;
            hr[core] = kInf;
        } else {
            if (head > 64 && head > size / 2) {
                fleet.erase(fleet.begin(), fleet.begin() + head);
                head = 0;
            }
            // first to retire next batch: warm its route line
            __builtin_prefetch(&L.route_links[fleet[head].route_off]);
            hr[core] = fleet[head].recv;
        }
    }

    inline void retire(double sent_ts) {
        // Retire in ascending-core order, fleet (arrival) order within
        // a core -- the reference's noc_update_all_tracked_messages scan
        // order. The due-detection runs nearly once per message, so it is
        // two-level: scan the per-8-core block minima (kept fresh by
        // refresh_block) and touch only blocks with a due core.
        const int n_cores = L.n_cores;
        double *hr = s.head_recv.data();
#if defined(__AVX512F__)
        const __m512d vts = _mm512_set1_pd(sent_ts);
        __m512d vmin = _mm512_set1_pd(kInf);
        double *bm = s.block_min.data();
        const int nb = (n_cores + 7) / 8;       // 8-core blocks
        const int nvb = (nb + 7) / 8;           // vectors of block minima
        for (int vb = 0; vb < nvb; ++vb) {
            __m512d mv = _mm512_loadu_pd(bm + 8 * vb);
            __mmask8 due_blocks = _mm512_cmp_pd_mask(mv, vts, _CMP_LE_OQ);
            while (due_blocks) {
                const int b = 8 * vb + __builtin_ctz(due_blocks);
                due_blocks = static_cast<__mmask8>(
                    due_blocks & (due_blocks - 1));
                const __m512d v = _mm512_loadu_pd(hr + 8 * b);
                __mmask8 due = _mm512_cmp_pd_mask(v, vts, _CMP_LE_OQ);
                const int base = 8 * b;
                while (due) {
                    const int l = __builtin_ctz(due);
                    due = static_cast<__mmask8>(due & (due - 1));
                    drain_core(base + l, sent_ts);
                }
                refresh_block(base);  // once per touched block
            }
            mv = _mm512_loadu_pd(bm + 8 * vb);  // refreshed by drains
            vmin = _mm512_min_pd(vmin, mv);
        }
        retire_lb = _mm512_reduce_min_pd(vmin);
#else
        double new_lb = kInf;
        for (int core = 0; core < n_cores; ++core) {
            if (hr[core] <= sent_ts) drain_core(core, sent_ts);
            if (hr[core] < new_lb) new_lb = hr[core];
        }
        retire_lb = new_lb;
#endif
    }

    inline void advance() {
        uint64_t t0 = 0;
        if (kProf) {
            t0 = prof_tsc();
            g_sweep_prof.events += 1;
        }
        const LiteEntry e = lite_heap_pop(s.heap);
        if (!s.heap.empty()) {
            // the likely-next message; hides its load latency behind the
            // current message's processing
            __builtin_prefetch(&s.msgs[s.heap.front().idx]);
        }
        double sent_ts = e.key;
        if (sent_ts > last_ts) last_ts = sent_ts;
        if (kProf) {
            const uint64_t t1 = prof_tsc();
            g_sweep_prof.pop += t1 - t0;
            t0 = t1;
        }

        if (sent_ts >= retire_lb) {
            if (kProf) g_sweep_prof.retire_calls += 1;
            retire(sent_ts);
        }
        if (kProf) {
            const uint64_t t1 = prof_tsc();
            g_sweep_prof.retire += t1 - t0;
            t0 = t1;
        }

        const MsgLite &m = s.msgs[e.idx];
        if (m.dest >= 0) {
            double flow = 0.0;
            const double adj = L.adj_by_cap[m.cap_hops];
            const int32_t *lp = &L.route_links[m.route_off];
            for (int32_t k = 0; k < m.route_len; ++k) {
                double &d = s.density[lp[k]];
                flow += d;
                d += adj;
            }
            const double path_capacity =
                static_cast<double>(m.cap_hops) * L.buffer_size;
            if (flow > path_capacity) {
                sent_ts += (flow - path_capacity) * mean;
            }
            const double congestion =
                flow * mean / static_cast<double>(m.cap_hops);
            const double net =
                (m.min_hop > congestion) ? m.min_hop : congestion;
            const double earliest = sent_ts + net;
            double &fin = s.fin[m.dest];
            const double recv = (fin > earliest) ? fin : earliest;
            fin = (fin + m.proc > earliest + m.proc) ? fin + m.proc
                                                     : earliest + m.proc;
            if (fin > last_ts) last_ts = fin;
            mean += (m.proc - mean) / (in_noc + 1.0);
            in_noc += 1;
            auto &fleet = s.fleets[m.dest];
            const bool was_empty = fleet.empty();
            fleet.push_back(
                {recv, m.proc, m.route_off, m.route_len, m.cap_hops});
            if (was_empty) {
                s.head_recv[m.dest] = recv;
                refresh_block(m.dest);
                if (recv < retire_lb) retire_lb = recv;
            }
        }
        if (kProf) {
            const uint64_t t1 = prof_tsc();
            g_sweep_prof.send += t1 - t0;
            t0 = t1;
        }

        if (s.heads[e.core] < s.core_begin[e.core + 1]) {
            push_next(e.core, sent_ts);
        }
        if (kProf) g_sweep_prof.push += prof_tsc() - t0;
    }
};

using LiteSweep = LiteSweepT<false>;

double sweep_timestep_lite(const ChipLayout &L, SweepScratch &s) {
    LiteSweep sweep(L, s);
    sweep.start();
    while (sweep.live()) sweep.advance();
    return sweep.last_ts;
}

// Interleave the event sweeps of up to kMaxSweepLanes INDEPENDENT
// timesteps through one loop (the per-timestep sweeps share no state).
// Hypothesis: each sweep is a serial dependence chain stalling on
// data-dependent loads, and round-robining chains overlaps their stalls.
// MEASURED on this host (scripts/measure_sweep_lanes.py, DVS 500 steps):
// 2 lanes = 1.02x, 4 = 0.92x, 8 = 0.78x — one sweep's working set
// already saturates L1/L2, so extra lanes thrash instead of hiding
// latency. Default stays 1 (serial); the machinery remains for wider-
// cache hosts via SANAFE_SWEEP_LANES (bit-exact at any lane count —
// tests/test_native_sweep.py::test_sweep_lane_count_is_bit_exact).
constexpr int kMaxSweepLanes = 8;

inline int sweep_lanes_from_env() {
    const char *e = getenv("SANAFE_SWEEP_LANES");
    int v = e ? atoi(e) : 1;
    if (v < 1) v = 1;
    if (v > kMaxSweepLanes) v = kMaxSweepLanes;
    return v;
}

void sweep_timestep_lite_group(const ChipLayout &L,
                               SweepScratch *const *ss, double *out,
                               int n) {
    if (n == 1) {  // default: the plain serial loop, no lane overhead
        LiteSweep sweep(L, *ss[0]);
        sweep.start();
        while (sweep.live()) sweep.advance();
        out[0] = sweep.last_ts;
        return;
    }
    std::optional<LiteSweep> sweeps[kMaxSweepLanes];
    for (int i = 0; i < n; ++i) {
        sweeps[i].emplace(L, *ss[i]);
        sweeps[i]->start();
    }
    for (;;) {
        bool any = false;
        for (int i = 0; i < n; ++i) {
            if (sweeps[i]->live()) {
                sweeps[i]->advance();
                any = true;
            }
        }
        if (!any) break;
    }
    for (int i = 0; i < n; ++i) out[i] = sweeps[i]->last_ts;
}

// One timestep's event sweep (src/schedule.cpp:208-292). Returns the final
// timestamp (before the sync delay is added).
double sweep_timestep(const ChipLayout &L,
                      std::vector<std::vector<Msg>> &queues) {
    NocState noc(L);
    std::vector<int32_t> heads(L.n_cores, 0);
    EventHeap heap;
    int64_t seq = 0;
    double last_ts = 0.0;
    constexpr double kInf = std::numeric_limits<double>::infinity();
    double retire_lb = kInf;  // min recv_ts of any in-flight message
    // monotone mode: one live (head recv_ts, core) entry per occupied fleet
    std::priority_queue<std::pair<double, int32_t>,
                        std::vector<std::pair<double, int32_t>>,
                        std::greater<>>
        head_heap;
    std::vector<int32_t> retire_cores;

    auto push_next = [&](int core, const Msg *base) {
        int32_t i = heads[core]++;
        Msg &m = queues[core][i];
        m.sent_ts = (base == nullptr) ? m.gen_delay
                                      : base->sent_ts + m.gen_delay;
        heap.push({m.sent_ts, seq++, static_cast<int32_t>(core), i});
        if (m.sent_ts > last_ts) last_ts = m.sent_ts;
    };

    for (int core = 0; core < L.n_cores; ++core) {
        if (!queues[core].empty()) push_next(core, nullptr);
    }

    static const bool dbg = getenv("SANAFE_DBG_SWEEP") != nullptr;
    if (dbg) fprintf(stderr, "SWEEP\n");
    while (!heap.empty()) {
        HeapEntry e = heap.top();
        heap.pop();
        Msg &m = queues[e.core][e.idx];
        if (m.sent_ts > last_ts) last_ts = m.sent_ts;
        if (dbg) {
            fprintf(stderr, "EVT %d %d %.17g %.17g %d %.17g\n", e.core,
                    m.axon < 0 ? -1 : m.dest_core, m.sent_ts,
                    noc.mean_in_flight_recv_delay, noc.messages_in_noc,
                    m.proc_delay);
        }

        // Retire every in-flight message received by now, visiting dest
        // cores in id order and each list in arrival order — the exact
        // update sequence of noc_update_all_tracked_messages
        // (src/schedule.cpp:380-400); the rolling mean is order-sensitive.
        // Monotone mode keeps ONE live (head recv_ts, core) entry per
        // occupied fleet in a min-heap, so a trigger touches only the
        // cores that actually retire something instead of every occupied
        // fleet; the retire set is sorted to preserve core-id order.
        if (m.sent_ts >= retire_lb) {
            if (L.monotone_recv) {
                retire_cores.clear();
                while (!head_heap.empty() &&
                       head_heap.top().first <= m.sent_ts) {
                    retire_cores.push_back(head_heap.top().second);
                    head_heap.pop();
                }
                std::sort(retire_cores.begin(), retire_cores.end());
                for (const int32_t core : retire_cores) {
                    auto &fleet = noc.in_flight[core];
                    int32_t &head = noc.fleet_head[core];
                    const int32_t size = static_cast<int32_t>(fleet.size());
                    // recv_ts is nondecreasing within a fleet: pop
                    // retirable fronts, stop at the first keeper.
                    while (head < size && m.sent_ts >= fleet[head].recv_ts) {
                        Msg &rm = queues[fleet[head].core][fleet[head].idx];
                        update_density(L, noc, rm, false);
                        update_rolling_mean(noc, rm, false);
                        ++head;
                    }
                    if (head >= size) {
                        fleet.clear();
                        head = 0;
                    } else {
                        if (head > 64 && head > size / 2) {
                            // Bound the retired-slot slack on message-heavy
                            // timesteps where the fleet never fully drains.
                            fleet.erase(fleet.begin(), fleet.begin() + head);
                            head = 0;
                        }
                        head_heap.push({fleet[head].recv_ts, core});
                    }
                }
                retire_lb =
                    head_heap.empty() ? kInf : head_heap.top().first;
            } else {
                // exotic (negative-latency) configs: full scan with
                // in-place compaction, preserving order; keepers are
                // unsorted so the new bound is the min over all of them
                double new_lb = kInf;
                for (size_t w = 0; w < noc.nonempty.size(); ++w) {
                    uint64_t bits = noc.nonempty[w];
                    while (bits) {
                        const int core =
                            static_cast<int>(w * 64) + __builtin_ctzll(bits);
                        bits &= bits - 1;
                        auto &fleet = noc.in_flight[core];
                        int32_t &head = noc.fleet_head[core];
                        const int32_t size =
                            static_cast<int32_t>(fleet.size());
                        int32_t kept = head;
                        for (int32_t k = head; k < size; ++k) {
                            Msg &rm = queues[fleet[k].core][fleet[k].idx];
                            if (m.sent_ts >= fleet[k].recv_ts) {
                                update_density(L, noc, rm, false);
                                update_rolling_mean(noc, rm, false);
                            } else {
                                if (fleet[k].recv_ts < new_lb) {
                                    new_lb = fleet[k].recv_ts;
                                }
                                fleet[kept++] = fleet[k];
                            }
                        }
                        fleet.resize(kept);
                        if (head >= static_cast<int32_t>(fleet.size())) {
                            fleet.clear();
                            head = 0;
                            noc.nonempty[w] &= ~(1ull << (core & 63));
                        }
                    }
                }
                retire_lb = new_lb;
            }
        }

        if (m.axon >= 0) {
            // schedule_handle_message (src/schedule.cpp:306-358)
            const int32_t a = m.axon;
            // One pass over the route: read the pre-entry flow AND apply
            // this message's density contribution (nothing between the
            // read and the add reads densities, so fusing is exact).
            const double adj = L.density_adjust[a];
            double flow = 0.0;
            for (int32_t i = L.route_start[a]; i < L.route_start[a + 1];
                 ++i) {
                double &d = noc.density[L.route_links[i]];
                flow += d;
                d += adj;
            }
            m.route_density = flow;
            const double path_capacity =
                (L.hops[a] + 1.0) * L.buffer_size;
            if (flow > path_capacity) {
                m.block_delay =
                    (flow - path_capacity) * noc.mean_in_flight_recv_delay;
                m.sent_ts += m.block_delay;
            } else {
                m.block_delay = 0.0;
            }
            const double congestion_delay = flow *
                                            noc.mean_in_flight_recv_delay /
                                            (L.hops[a] + 1.0);
            m.net_delay = std::max(m.min_hop_delay, congestion_delay);
            const double earliest = m.sent_ts + m.net_delay;
            double &fin = noc.core_finished_receiving[m.dest_core];
            m.recv_ts = std::max(fin, earliest);
            fin = std::max(fin + m.proc_delay, earliest + m.proc_delay);
            m.proc_ts = fin;
            if (m.proc_ts > last_ts) last_ts = m.proc_ts;
            // density already applied in the fused route pass above
            update_rolling_mean(noc, m, true);
            auto &fleet = noc.in_flight[m.dest_core];
            const bool was_empty = fleet.empty();
            fleet.push_back({m.recv_ts, e.core, e.idx});
            if (L.monotone_recv) {
                if (was_empty) {
                    head_heap.push({m.recv_ts, m.dest_core});
                    retire_lb = head_heap.top().first;
                }
            } else {
                noc.nonempty[m.dest_core >> 6] |=
                    1ull << (m.dest_core & 63);
                if (m.recv_ts < retire_lb) retire_lb = m.recv_ts;
            }
        }

        if (heads[e.core] < static_cast<int32_t>(queues[e.core].size())) {
            push_next(e.core, &m);
        }
    }
    return last_ts;
}

double run_cycle_timestep(const ChipLayout &L,
                          const cycle_noc::Params &params, double clock,
                          const std::vector<std::vector<Msg>> &queues) {
    std::vector<cycle_noc::Packet> packets;
    for (int core = 0; core < L.n_cores; ++core) {
        double sent = 0.0;
        for (const Msg &m : queues[core]) {
            sent += m.gen_delay;
            cycle_noc::Packet pkt;
            pkt.src_core = core;
            pkt.ready_cycle = static_cast<int64_t>(
                std::llround(sent / clock));
            if (m.axon < 0) {
                pkt.dest_router = -1;
                pkt.dest_core = 0;
                pkt.proc_cycles = 0;
                pkt.src_router = 0;
            } else {
                const int32_t a = m.axon;
                pkt.src_router = L.src_x[a] * params.height + L.src_y[a];
                pkt.dest_router = L.dest_x[a] * params.height + L.dest_y[a];
                pkt.dest_core = L.dest_core[a];
                pkt.proc_cycles = static_cast<int64_t>(
                    std::llround(m.proc_delay / clock));
            }
            packets.push_back(pkt);
        }
    }
    cycle_noc::Network network(params, L.n_cores);
    const int64_t last_cycle = network.run(packets);
    return static_cast<double>(last_cycle) * clock;
}

}  // namespace

extern "C" {

int64_t sched_create(
    int32_t noc_w, int32_t noc_h, int32_t links_per_tile,
    int32_t buffer_size, int32_t n_cores, int32_t n_axons, int32_t n_neurons,
    const int32_t *axon_src_slot, const int32_t *axon_src_core,
    const int32_t *axon_dest_core, const int32_t *axon_src_x,
    const int32_t *axon_src_y, const int32_t *axon_dest_x,
    const int32_t *axon_dest_y, const int32_t *axon_src_core_offset,
    const int32_t *axon_hops, const int32_t *axon_ordinal,
    const double *axon_latency_out, const double *axon_proc_delay,
    const double *axon_min_hop_delay, const int32_t *core_slot_lo,
    const int32_t *core_slot_hi, const double *neuron_lat_base,
    const double *neuron_lat_update, const double *neuron_lat_spike) {
    auto *L = new ChipLayout();
    L->noc_w = noc_w;
    L->noc_h = noc_h;
    L->links_per_tile = links_per_tile;
    L->buffer_size = buffer_size;
    L->n_cores = n_cores;
    L->n_axons = n_axons;
    L->n_neurons = n_neurons;
    auto copy32 = [n_axons](HugeVec<int32_t> &dst, const int32_t *src) {
        dst.assign(src, src + n_axons);
    };
    auto copy64 = [n_axons](HugeVec<double> &dst, const double *src) {
        dst.assign(src, src + n_axons);
    };
    copy32(L->src_slot, axon_src_slot);
    copy32(L->src_core, axon_src_core);
    copy32(L->dest_core, axon_dest_core);
    copy32(L->src_x, axon_src_x);
    copy32(L->src_y, axon_src_y);
    copy32(L->dest_x, axon_dest_x);
    copy32(L->dest_y, axon_dest_y);
    copy32(L->src_core_offset, axon_src_core_offset);
    copy32(L->hops, axon_hops);
    copy32(L->ordinal, axon_ordinal);
    copy64(L->latency_out, axon_latency_out);
    copy64(L->proc_delay, axon_proc_delay);
    copy64(L->min_hop_delay, axon_min_hop_delay);
    L->monotone_recv = true;
    for (int32_t a = 0; a < n_axons; ++a) {
        if (L->proc_delay[a] < 0.0) {
            L->monotone_recv = false;
            break;
        }
    }
    L->core_slot_lo.assign(core_slot_lo, core_slot_lo + n_cores);
    L->core_slot_hi.assign(core_slot_hi, core_slot_hi + n_cores);
    L->lat_base.assign(neuron_lat_base, neuron_lat_base + n_neurons);
    L->lat_update.assign(neuron_lat_update, neuron_lat_update + n_neurons);
    L->lat_spike.assign(neuron_lat_spike, neuron_lat_spike + n_neurons);
    // pad to whole 8-lane blocks so the vectorized per-slot latency pass
    // can load full vectors (padding lanes are never read by the walks)
    const size_t n_pad = (static_cast<size_t>(n_neurons) + 7) & ~size_t(7);
    L->lat_base.resize(n_pad, 0.0);
    L->lat_update.resize(n_pad, 0.0);
    L->lat_spike.resize(n_pad, 0.0);
    // Axon ids are allocated core-major so a stable counting pass groups them.
    L->core_axon_start.assign(n_cores + 1, 0);
    for (int32_t a = 0; a < n_axons; ++a) {
        L->core_axon_start[L->src_core[a] + 1] += 1;
    }
    for (int32_t c = 0; c < n_cores; ++c) {
        L->core_axon_start[c + 1] += L->core_axon_start[c];
    }
    L->core_axons.resize(n_axons);
    std::vector<int32_t> cursor(L->core_axon_start.begin(),
                                L->core_axon_start.end() - 1);
    for (int32_t a = 0; a < n_axons; ++a) {
        L->core_axons[cursor[L->src_core[a]]++] = a;
    }
    // Cache each axon's DOR route (recomputed 3x per message otherwise)
    L->route_start.assign(n_axons + 1, 0);
    L->density_adjust.resize(n_axons);
    for (int32_t a = 0; a < n_axons; ++a) {
        int count = 0;
        for_route_links(*L, L->src_x[a], L->src_y[a], L->dest_x[a],
                        L->dest_y[a], L->src_core_offset[a],
                        [&](int) { ++count; });
        L->route_start[a + 1] = L->route_start[a] + count;
        L->density_adjust[a] = 1.0 / (2.0 + L->hops[a]);
    }
    L->route_links.resize(L->route_start[n_axons]);
    for (int32_t a = 0; a < n_axons; ++a) {
        int32_t cursor2 = L->route_start[a];
        for_route_links(*L, L->src_x[a], L->src_y[a], L->dest_x[a],
                        L->dest_y[a], L->src_core_offset[a],
                        [&](int link) { L->route_links[cursor2++] = link; });
    }

    L->hot.resize(n_axons);
    int32_t max_cap = 0;
    for (int32_t a = 0; a < n_axons; ++a) {
        ChipLayout::AxonHot &h = L->hot[a];
        h.proc = L->proc_delay[a];
        h.min_hop = L->min_hop_delay[a];
        h.adj = L->density_adjust[a];
        h.lat_out = L->latency_out[a];
        h.dest = L->dest_core[a];
        h.route_off = L->route_start[a];
        h.route_len = L->route_start[a + 1] - L->route_start[a];
        h.path_capacity_hops = L->hops[a] + 1;
        if (h.path_capacity_hops > max_cap) max_cap = h.path_capacity_hops;
        if (h.dest >= 32767 || h.route_len > 255 ||
            h.path_capacity_hops > 255) {
            L->lite_fields_ok = false;
        }
    }
    L->adj_by_cap.assign(static_cast<size_t>(max_cap) + 1, 0.0);
    for (int32_t a = 0; a < n_axons; ++a) {
        // adj is a pure function of hops (1/(2+hops)); index it by the
        // hops+1 already carried for the path-capacity term
        L->adj_by_cap[L->hops[a] + 1] = L->density_adjust[a];
    }

    // axon ids are slot-major ascending, so a counting pass gives per-slot
    // ranges directly
    L->slot_axon_start.assign(n_neurons + 1, 0);
    for (int32_t a = 0; a < n_axons; ++a) {
        L->slot_axon_start[L->src_slot[a] + 1] += 1;
    }
    for (int32_t s = 0; s < n_neurons; ++s) {
        L->slot_axon_start[s + 1] += L->slot_axon_start[s];
    }

    std::lock_guard<std::mutex> lock(g_chips_mutex);
    g_chips.push_back(L);
    return static_cast<int64_t>(g_chips.size() - 1);
}

void sched_destroy(int64_t handle) {
    std::lock_guard<std::mutex> lock(g_chips_mutex);
    if (handle >= 0 && handle < static_cast<int64_t>(g_chips.size())) {
        delete g_chips[handle];
        g_chips[handle] = nullptr;
    }
}

// Run the detailed sweep for a chunk of T timesteps.
//   fired:    [T, n_axons] uint8
//   gen_lat:  [T, n_neurons] double
//   sim_time: [T] double out (includes sync_delay)
// Parallel across timesteps. Returns 0 on success.
int32_t sched_run_chunk(int64_t handle, int32_t T, const uint8_t *fired,
                        const double *gen_lat, double sync_delay,
                        double *sim_time, int32_t n_threads) {
    ChipLayout *L;
    {
        std::lock_guard<std::mutex> lock(g_chips_mutex);
        if (handle < 0 || handle >= static_cast<int64_t>(g_chips.size()) ||
            g_chips[handle] == nullptr) {
            return -1;
        }
        L = g_chips[handle];
    }
#ifdef _OPENMP
    if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel
    {
        std::vector<std::vector<Msg>> queues;
#pragma omp for schedule(dynamic)
        for (int32_t t = 0; t < T; ++t) {
            build_messages(*L, fired + static_cast<size_t>(t) * L->n_axons,
                           gen_lat + static_cast<size_t>(t) * L->n_neurons,
                           queues);
            sim_time[t] = sweep_timestep(*L, queues) + sync_delay;
        }
    }
#else
    std::vector<std::vector<Msg>> queues;
    for (int32_t t = 0; t < T; ++t) {
        build_messages(*L, fired + static_cast<size_t>(t) * L->n_axons,
                       gen_lat + static_cast<size_t>(t) * L->n_neurons,
                       queues);
        sim_time[t] = sweep_timestep(*L, queues) + sync_delay;
    }
#endif
    return 0;
}

// Packed-mask chunk runner: masks is [T, 2, mask_bytes] uint8 with plane 0 =
// fired bits and plane 1 = updated bits (MSB-first per byte, numpy
// packbits layout). Latencies are derived from the registered per-neuron
// components in float64. Parallel across timesteps.
int32_t sched_run_chunk_packed(int64_t handle, int32_t T,
                               const uint8_t *masks, int32_t mask_bytes,
                               double sync_delay, double *sim_time,
                               int32_t n_threads) {
    ChipLayout *L;
    {
        std::lock_guard<std::mutex> lock(g_chips_mutex);
        if (handle < 0 || handle >= static_cast<int64_t>(g_chips.size()) ||
            g_chips[handle] == nullptr) {
            return -1;
        }
        L = g_chips[handle];
    }
    const size_t step_stride = 2 * static_cast<size_t>(mask_bytes);
    const bool lite = L->monotone_recv && L->lite_fields_ok;
    const int lanes = sweep_lanes_from_env();
    const int32_t n_groups = (T + lanes - 1) / lanes;
#ifdef _OPENMP
    if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel
    {
        std::vector<std::vector<Msg>> queues;
        SweepScratch scratch[kMaxSweepLanes];
#pragma omp for schedule(dynamic)
        for (int32_t g = 0; g < n_groups; ++g) {
            const int32_t t0 = g * lanes;
            const int n = std::min<int32_t>(lanes, T - t0);
            if (lite) {
                SweepScratch *sp[kMaxSweepLanes];
                double out[kMaxSweepLanes];
                for (int i = 0; i < n; ++i) {
                    const uint8_t *fired = masks + (t0 + i) * step_stride;
                    scratch[i].init(*L);
                    build_messages_lite(*L, fired, fired + mask_bytes,
                                        scratch[i]);
                    sp[i] = &scratch[i];
                }
                sweep_timestep_lite_group(*L, sp, out, n);
                for (int i = 0; i < n; ++i) {
                    sim_time[t0 + i] = out[i] + sync_delay;
                }
            } else {
                for (int i = 0; i < n; ++i) {
                    const uint8_t *fired = masks + (t0 + i) * step_stride;
                    build_messages_packed(*L, fired, fired + mask_bytes,
                                          queues);
                    sim_time[t0 + i] =
                        sweep_timestep(*L, queues) + sync_delay;
                }
            }
        }
    }
#else
    std::vector<std::vector<Msg>> queues;
    SweepScratch scratch[kMaxSweepLanes];
    for (int32_t g = 0; g < n_groups; ++g) {
        const int32_t t0 = g * lanes;
        const int n = std::min<int32_t>(lanes, T - t0);
        if (lite) {
            SweepScratch *sp[kMaxSweepLanes];
            double out[kMaxSweepLanes];
            for (int i = 0; i < n; ++i) {
                const uint8_t *fired = masks + (t0 + i) * step_stride;
                scratch[i].init(*L);
                build_messages_lite(*L, fired, fired + mask_bytes,
                                    scratch[i]);
                sp[i] = &scratch[i];
            }
            sweep_timestep_lite_group(*L, sp, out, n);
            for (int i = 0; i < n; ++i) {
                sim_time[t0 + i] = out[i] + sync_delay;
            }
        } else {
            for (int i = 0; i < n; ++i) {
                const uint8_t *fired = masks + (t0 + i) * step_stride;
                build_messages_packed(*L, fired, fired + mask_bytes, queues);
                sim_time[t0 + i] = sweep_timestep(*L, queues) + sync_delay;
            }
        }
    }
#endif
    return 0;
}

// Profiling hook (used by perf tooling, not the simulator): re-runs the
// packed chunk `iters` times. phase 0 = message build only, phase 1 =
// build + sweep. Returns a checksum-ish accumulator so the work cannot
// be dead-code-eliminated.
double sched_bench_packed(int64_t handle, int32_t T, const uint8_t *masks,
                          int32_t mask_bytes, double sync_delay,
                          int32_t iters, int32_t phase) {
    ChipLayout *L;
    {
        std::lock_guard<std::mutex> lock(g_chips_mutex);
        if (handle < 0 || handle >= static_cast<int64_t>(g_chips.size()) ||
            g_chips[handle] == nullptr) {
            return -1.0;
        }
        L = g_chips[handle];
    }
    if (!L->monotone_recv || !L->lite_fields_ok) {
        // the lite path this hook profiles requires nondecreasing
        // per-fleet receive times (see sweep_timestep_lite) and
        // narrow-field-compatible axon constants
        return -1.0;
    }
    const size_t step_stride = 2 * static_cast<size_t>(mask_bytes);
    double acc = 0.0;
    if (phase >= 2) {
        // phase N >= 2: group sweep with N interleave lanes (caps at
        // kMaxSweepLanes) — used to pick the SANAFE_SWEEP_LANES default.
        const int lanes = std::min(phase, kMaxSweepLanes);
        SweepScratch scratch[kMaxSweepLanes];
        const int32_t n_groups = (T + lanes - 1) / lanes;
        for (int32_t it = 0; it < iters; ++it) {
            for (int32_t g = 0; g < n_groups; ++g) {
                const int32_t t0 = g * lanes;
                const int n = std::min<int32_t>(lanes, T - t0);
                SweepScratch *sp[kMaxSweepLanes];
                double out[kMaxSweepLanes];
                for (int i = 0; i < n; ++i) {
                    const uint8_t *fired = masks + (t0 + i) * step_stride;
                    scratch[i].init(*L);
                    build_messages_lite(*L, fired, fired + mask_bytes,
                                        scratch[i]);
                    sp[i] = &scratch[i];
                }
                sweep_timestep_lite_group(*L, sp, out, n);
                for (int i = 0; i < n; ++i) acc += out[i] + sync_delay;
            }
        }
        return acc;
    }
    SweepScratch scratch;
    for (int32_t it = 0; it < iters; ++it) {
        for (int32_t t = 0; t < T; ++t) {
            const uint8_t *fired = masks + t * step_stride;
            const uint8_t *updated = fired + mask_bytes;
            scratch.init(*L);
            build_messages_lite(*L, fired, updated, scratch);
            if (phase == 0) {
                acc += static_cast<double>(scratch.msgs.size());
            } else {
                acc += sweep_timestep_lite(*L, scratch) + sync_delay;
            }
        }
    }
    return acc;
}

// Section-level profile of the lite event sweep (rdtsc cycles). Runs the
// kProf=true instantiation — identical float64 semantics, extra counter
// instructions — and fills out[12] with:
//   [0..3]  cycles in heap-pop / retire / send / push-next
//   [4..6]  event count, retire() calls, drained (retired) messages
//   [7]     checksum (sum of per-step sweep results, anti-DCE)
// Profiling tool only; never on the simulation path.
extern "C" int32_t sched_sweep_profile(int64_t handle, int32_t T,
                                       const uint8_t *masks,
                                       int32_t mask_bytes,
                                       double sync_delay, int32_t iters,
                                       double *out) {
    ChipLayout *L;
    {
        std::lock_guard<std::mutex> lock(g_chips_mutex);
        if (handle < 0 || handle >= static_cast<int64_t>(g_chips.size()) ||
            g_chips[handle] == nullptr) {
            return -1;
        }
        L = g_chips[handle];
    }
    if (!L->monotone_recv || !L->lite_fields_ok) return -1;
    const size_t step_stride = 2 * static_cast<size_t>(mask_bytes);
    g_sweep_prof.reset();
    double acc = 0.0;
    SweepScratch scratch;
    for (int32_t it = 0; it < iters; ++it) {
        for (int32_t t = 0; t < T; ++t) {
            const uint8_t *fired = masks + t * step_stride;
            scratch.init(*L);
            build_messages_lite(*L, fired, fired + mask_bytes, scratch);
            LiteSweepT<true> sweep(*L, scratch);
            sweep.start();
            while (sweep.live()) sweep.advance();
            acc += sweep.last_ts + sync_delay;
        }
    }
    out[0] = static_cast<double>(g_sweep_prof.pop);
    out[1] = static_cast<double>(g_sweep_prof.retire);
    out[2] = static_cast<double>(g_sweep_prof.send);
    out[3] = static_cast<double>(g_sweep_prof.push);
    out[4] = static_cast<double>(g_sweep_prof.events);
    out[5] = static_cast<double>(g_sweep_prof.retire_calls);
    out[6] = static_cast<double>(g_sweep_prof.drains);
    out[7] = acc;
    for (int i = 8; i < 12; ++i) out[i] = 0.0;
    return 0;
}

// Cycle-accurate chunk runner: same inputs as sched_run_chunk_packed, but
// each timestep's messages run through the flit-level cmesh NoC model
// (sanafe_tpu/native_src/cycle_noc.h) instead of the semi-analytical sweep. Mirrors the
// reference's Booksim2 tier (src/schedule.cpp:104-167): sim_time = cycle of
// the last processed packet * clock_period + sync_delay.
int32_t sched_run_chunk_cycle(int64_t handle, int32_t T,
                              const uint8_t *masks, int32_t mask_bytes,
                              double sync_delay, double *sim_time,
                              int32_t n_threads) {
    ChipLayout *L;
    {
        std::lock_guard<std::mutex> lock(g_chips_mutex);
        if (handle < 0 || handle >= static_cast<int64_t>(g_chips.size()) ||
            g_chips[handle] == nullptr) {
            return -1;
        }
        L = g_chips[handle];
    }
    cycle_noc::Params params;
    params.width = L->noc_w;
    params.height = L->noc_h;
    params.cores_per_router = L->links_per_tile - 4;
    // The reference's shipped Booksim configuration runs two physical
    // subnetworks (scripts/booksim.config `subnets = 2`, the NanoMesh/
    // Loihi dual-channel NoC); see cycle_noc::Params::subnets for the
    // assignment model. Override for experiments via SANAFE_NOC_SUBNETS.
    params.subnets = 2;
    if (const char *env = std::getenv("SANAFE_NOC_SUBNETS")) {
        const int v = std::atoi(env);
        if (v >= 1) params.subnets = v;
    }
    const double clock = params.clock_period;
    const size_t step_stride = 2 * static_cast<size_t>(mask_bytes);
#ifdef _OPENMP
    if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel
    {
        std::vector<std::vector<Msg>> queues;
#pragma omp for schedule(dynamic)
        for (int32_t t = 0; t < T; ++t) {
            const uint8_t *fired = masks + t * step_stride;
            const uint8_t *updated = fired + mask_bytes;
            build_messages_packed(*L, fired, updated, queues);
            sim_time[t] =
                run_cycle_timestep(*L, params, clock, queues) + sync_delay;
        }
    }
#else
    std::vector<std::vector<Msg>> queues;
    for (int32_t t = 0; t < T; ++t) {
        const uint8_t *fired = masks + t * step_stride;
        const uint8_t *updated = fired + mask_bytes;
        build_messages_packed(*L, fired, updated, queues);
        sim_time[t] =
            run_cycle_timestep(*L, params, clock, queues) + sync_delay;
    }
#endif
    return 0;
}

// Single-timestep variant that also exports every per-message field for the
// message trace (messages.csv). Caller provides output arrays sized to the
// message count (fired axon count + up to n_cores placeholders).
//   Returns the number of messages written, or -1 on error.
int32_t sched_run_timestep_trace(
    int64_t handle, const uint8_t *fired, const double *gen_lat,
    double sync_delay, double *sim_time,
    int32_t *out_axon, int32_t *out_src_core, double *out_gen,
    double *out_proc, double *out_net, double *out_block, double *out_sent,
    double *out_recv, double *out_done, double *out_density) {
    ChipLayout *L;
    {
        std::lock_guard<std::mutex> lock(g_chips_mutex);
        if (handle < 0 || handle >= static_cast<int64_t>(g_chips.size()) ||
            g_chips[handle] == nullptr) {
            return -1;
        }
        L = g_chips[handle];
    }
    std::vector<std::vector<Msg>> queues;
    build_messages(*L, fired, gen_lat, queues);
    *sim_time = sweep_timestep(*L, queues) + sync_delay;
    int32_t k = 0;
    for (const auto &q : queues) {
        for (const Msg &m : q) {
            out_axon[k] = m.axon;
            out_src_core[k] = m.src_core;
            out_gen[k] = m.gen_delay;
            out_proc[k] = m.proc_delay;
            out_net[k] = m.net_delay;
            out_block[k] = m.block_delay;
            out_sent[k] = m.sent_ts;
            out_recv[k] = m.recv_ts;
            out_done[k] = m.proc_ts;
            out_density[k] = m.route_density;
            ++k;
        }
    }
    return k;
}

// Direct test entry into the flit-level cmesh model (cycle_noc.h): runs
// one batch of packets through Network::run with explicit parameters and
// returns per-packet completion cycles plus the final cycle. Exists so
// unit tests can pin EXACT cycle counts on hand-analyzable schedules
// (tests/test_cycle_noc.py) — the validation the Booksim2-backed
// reference gets from its upstream fork.
int64_t cycle_noc_run(
    int32_t width, int32_t height, int32_t cores_per_router,
    int32_t buffer_size, int32_t router_delay, int32_t link_delay,
    int32_t subnets, int32_t n_cores, int32_t n_packets,
    const int32_t *src_router, const int32_t *dest_router,
    const int32_t *src_core, const int32_t *dest_core,
    const int64_t *ready_cycle, const int64_t *proc_cycles,
    int64_t *done_cycle_out) {
    cycle_noc::Params params;
    params.width = width;
    params.height = height;
    params.cores_per_router = cores_per_router;
    params.buffer_size = buffer_size;
    params.router_delay = router_delay;
    params.link_delay = link_delay;
    params.subnets = subnets;
    std::vector<cycle_noc::Packet> packets(n_packets);
    for (int32_t i = 0; i < n_packets; ++i) {
        packets[i].src_router = src_router[i];
        packets[i].dest_router = dest_router[i];
        packets[i].src_core = src_core[i];
        packets[i].dest_core = dest_core[i];
        packets[i].ready_cycle = ready_cycle[i];
        packets[i].proc_cycles = proc_cycles[i];
    }
    cycle_noc::Network network(params, n_cores);
    const int64_t last = network.run(packets);
    for (int32_t i = 0; i < n_packets; ++i) {
        done_cycle_out[i] = packets[i].done_cycle;
    }
    return last;
}

// Order-exact keyed accumulation: out[keys[i]] += values[i] applied in
// index order, one float64 add per event — the reference's per-unit
// energy accumulation (PipelineUnit::process, src/pipeline.cpp:101)
// iterates neurons in slot order, so accumulating per-slot event energies
// into per-unit bins in slot order reproduces its rounding exactly.
// Entries with key < 0 are skipped. Caller zeroes `out`.
void serial_keyed_sum_f64(const double *values, const int32_t *keys,
                          int64_t n, double *out) {
    for (int64_t i = 0; i < n; ++i) {
        const int32_t k = keys[i];
        if (k >= 0) out[k] += values[i];
    }
}

// Sort permutation for the message trace, replicating the reference's
// std::sort over CompareMessagesByID (src/chip.cpp:440-459,
// src/message.cpp:70-91). std::sort is comparison-based, so sorting an
// index array with the same comparator and the same input order yields the
// reference's exact permutation — including the unstable ordering of the
// all-equivalent placeholder entries (mid = -1), which a stable sort would
// order differently.
int32_t sort_message_trace_order(const int64_t *mids,
                                 const uint8_t *placeholder, int32_t n,
                                 int32_t *perm) {
    if (n <= 0) {
        return 0;  // callers may pass null buffers for an empty trace
    }
    std::vector<int32_t> idx(n);
    for (int32_t i = 0; i < n; ++i) idx[i] = i;
    std::sort(idx.begin(), idx.end(), [&](int32_t a, int32_t b) {
        const bool pa = placeholder[a] != 0;
        const bool pb = placeholder[b] != 0;
        if (pa && pb) return mids[a] < mids[b];
        if (pa) return false;
        if (pb) return true;
        return mids[a] < mids[b];
    });
    std::memcpy(perm, idx.data(), static_cast<size_t>(n) * sizeof(int32_t));
    return 0;
}

// Format spikes.csv rows ("<label>,<timestep>\n") straight from the
// device's bit-packed fired masks. The Python f-string path costs ~1 us
// per row, which dominates the host loop at DVS scale (~365 rows/step);
// this loop is ~30 ns/row. Row order matches the numpy path: timestep
// ascending, then label (slot-list) order. `bits` holds T rows of packed
// fired bits (numpy packbits MSB-first layout) spaced `row_stride` bytes
// apart; label j tests bit `bit_of_label[j]` and copies
// blob[label_off[j] : label_off[j+1]]. Returns bytes written, or -1 if
// `cap` would overflow (caller falls back to the Python path).
int64_t format_spike_rows(const uint8_t *bits, int64_t row_stride,
                          int32_t T, int64_t t0,
                          const int32_t *bit_of_label, int32_t n_labels,
                          const uint8_t *blob, const int64_t *label_off,
                          uint8_t *out, int64_t cap) {
    int64_t pos = 0;
    char dec[24];
    for (int32_t t = 0; t < T; ++t) {
        const uint8_t *row = bits + t * row_stride;
        // decimal of (t0 + t), rendered once per timestep
        int64_t v = t0 + t;
        int dec_len = 0;
        do {
            dec[dec_len++] = static_cast<char>('0' + (v % 10));
            v /= 10;
        } while (v != 0);
        for (int32_t j = 0; j < n_labels; ++j) {
            const int32_t b = bit_of_label[j];
            if (!(row[b >> 3] & (0x80u >> (b & 7)))) continue;
            const int64_t lo = label_off[j];
            const int64_t len = label_off[j + 1] - lo;
            if (pos + len + dec_len + 2 > cap) return -1;
            std::memcpy(out + pos, blob + lo, static_cast<size_t>(len));
            pos += len;
            out[pos++] = ',';
            for (int d = dec_len - 1; d >= 0; --d) out[pos++] = dec[d];
            out[pos++] = '\n';
        }
    }
    return pos;
}

// Total set bits across T packed rows (row_stride-spaced, n_bytes wide):
// a cheap upper bound on the number of spike rows for buffer sizing.
int64_t count_mask_bits(const uint8_t *bits, int64_t row_stride, int32_t T,
                        int32_t n_bytes) {
    int64_t total = 0;
    for (int32_t t = 0; t < T; ++t) {
        const uint8_t *row = bits + t * row_stride;
        int32_t i = 0;
        for (; i + 8 <= n_bytes; i += 8) {
            uint64_t w;
            std::memcpy(&w, row + i, 8);
            total += __builtin_popcountll(w);
        }
        for (; i < n_bytes; ++i) {
            total += __builtin_popcount(row[i]);
        }
    }
    return total;
}

}  // extern "C"
