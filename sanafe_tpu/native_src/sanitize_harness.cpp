// ASan/UBSan replay harness for the native scheduler.
//
// The reference project gates its C++ under Valgrind memcheck
// (/root/reference/CMakeLists.txt:335-336, tests/README.md:16). This
// repo's equivalent gate cannot run the Python suite under ASan (ASan's
// allocator aborts inside XLA's compiler), so the capture-then-replay
// split is used instead: scripts/capture_sanitize_replay.py records
// every byte that crosses the ctypes boundary during real simulations,
// and this standalone main() replays those exact calls — plus synthetic
// edge-case drives of the pure utility entry points — compiled with
// -fsanitize=address,undefined -fno-sanitize-recover=all (ci/run.py).
//
// Build (see ci/run.py sanitize gate):
//   g++ -std=c++17 -O1 -g -fopenmp -ffp-contract=off \
//       -fsanitize=address,undefined -fno-sanitize-recover=all \
//       sanitize_harness.cpp scheduler.cpp -o sanitize_harness
//   ./sanitize_harness /tmp/sanitize_replay.bin

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

// extern "C" surface of scheduler.cpp (kept in sync with the ctypes
// declarations in sanafe_tpu/native.py:_bind)
extern "C" {
int64_t sched_create(
    int32_t noc_w, int32_t noc_h, int32_t links_per_tile,
    int32_t buffer_size, int32_t n_cores, int32_t n_axons, int32_t n_neurons,
    const int32_t *, const int32_t *, const int32_t *, const int32_t *,
    const int32_t *, const int32_t *, const int32_t *, const int32_t *,
    const int32_t *, const int32_t *,
    const double *, const double *, const double *,
    const int32_t *, const int32_t *,
    const double *, const double *, const double *);
void sched_destroy(int64_t handle);
int32_t sched_run_chunk(int64_t handle, int32_t T, const uint8_t *fired,
                        const double *gen_lat, double sync, double *sim_time,
                        int32_t n_threads);
int32_t sched_run_chunk_packed(int64_t handle, int32_t T,
                               const uint8_t *masks, int32_t mask_bytes,
                               double sync, double *sim_time,
                               int32_t n_threads);
int32_t sched_run_chunk_cycle(int64_t handle, int32_t T,
                              const uint8_t *masks, int32_t mask_bytes,
                              double sync, double *sim_time,
                              int32_t n_threads);
int32_t sched_run_timestep_trace(
    int64_t handle, const uint8_t *fired, const double *gen_lat, double sync,
    double *sim_time, int32_t *axon, int32_t *src_core, double *gen_d,
    double *proc_d, double *net_d, double *block_d, double *sent,
    double *recv, double *proc_ts, double *density);
int32_t sort_message_trace_order(const int64_t *keys, const uint8_t *flags,
                                 int32_t n, int32_t *order);
void serial_keyed_sum_f64(const double *vals, const int32_t *keys, int64_t n,
                          double *out);
int64_t cycle_noc_run(int32_t width, int32_t height, int32_t cores_per_router,
                      int32_t buffer_size, int32_t router_delay,
                      int32_t link_delay, int32_t subnets, int32_t n_cores,
                      int32_t n_packets,
                      const int32_t *src_router, const int32_t *dest_router,
                      const int32_t *src_core, const int32_t *dest_core,
                      const int64_t *ready_cycle, const int64_t *proc_cycles,
                      int64_t *done_cycle_out);
int64_t format_spike_rows(const uint8_t *bits, int64_t row_stride,
                          int32_t T, int64_t t0,
                          const int32_t *bit_of_label, int32_t n_labels,
                          const uint8_t *blob, const int64_t *label_off,
                          uint8_t *out, int64_t cap);
int64_t count_mask_bits(const uint8_t *bits, int64_t row_stride, int32_t T,
                        int32_t n_bytes);
}

namespace {

struct Reader {
    FILE *fh;
    const char *path;
    void read(void *dst, size_t n) {
        if (fread(dst, 1, n, fh) != n) {
            std::fprintf(stderr, "replay file truncated: %s\n", path);
            std::exit(2);
        }
    }
    int32_t i32() { int32_t v; read(&v, 4); return v; }
    int64_t i64() { int64_t v; read(&v, 8); return v; }
    double f64() { double v; read(&v, 8); return v; }
    template <typename T>
    std::vector<T> vec(size_t n) {
        std::vector<T> v(n);
        if (n) read(v.data(), n * sizeof(T));
        return v;
    }
};

double g_checksum = 0.0;

void consume(const double *sim_time, int32_t T) {
    for (int32_t t = 0; t < T; ++t) g_checksum += sim_time[t];
}

int replay_sched(Reader &r) {
    int32_t scal[7];
    r.read(scal, sizeof(scal));
    const int32_t n_cores = scal[4], n_axons = scal[5], n_neurons = scal[6];
    std::vector<std::vector<int32_t>> i32a;
    for (int k = 0; k < 10; ++k) i32a.push_back(r.vec<int32_t>(n_axons));
    std::vector<std::vector<double>> f64a;
    for (int k = 0; k < 3; ++k) f64a.push_back(r.vec<double>(n_axons));
    auto core_lo = r.vec<int32_t>(n_cores);
    auto core_hi = r.vec<int32_t>(n_cores);
    std::vector<std::vector<double>> f64n;
    for (int k = 0; k < 3; ++k) f64n.push_back(r.vec<double>(n_neurons));

    int64_t h = sched_create(
        scal[0], scal[1], scal[2], scal[3], n_cores, n_axons, n_neurons,
        i32a[0].data(), i32a[1].data(), i32a[2].data(), i32a[3].data(),
        i32a[4].data(), i32a[5].data(), i32a[6].data(), i32a[7].data(),
        i32a[8].data(), i32a[9].data(),
        f64a[0].data(), f64a[1].data(), f64a[2].data(),
        core_lo.data(), core_hi.data(),
        f64n[0].data(), f64n[1].data(), f64n[2].data());
    if (h < 0) {
        std::fprintf(stderr, "sched_create failed\n");
        return 1;
    }

    int n_replayed = 0;
    const int32_t n_calls = r.i32();
    for (int32_t i = 0; i < n_calls; ++i) {
        const int32_t kind = r.i32();
        if (kind == 0 || kind == 2) {
            const int32_t T = r.i32();
            const int32_t B = r.i32();
            const double sync = r.f64();
            auto masks = r.vec<uint8_t>((size_t)T * 2 * B);
            std::vector<double> sim_time(T);
            // replay serial AND multithreaded (threads exercise the
            // OpenMP chunk split + per-thread scratch)
            for (int32_t nt : {1, 0}) {
                int32_t rc = kind == 0
                    ? sched_run_chunk_packed(h, T, masks.data(), B, sync,
                                             sim_time.data(), nt)
                    : sched_run_chunk_cycle(h, T, masks.data(), B, sync,
                                            sim_time.data(), nt);
                if (rc != 0) {
                    std::fprintf(stderr, "kind %d replay failed\n", kind);
                    return 1;
                }
                consume(sim_time.data(), T);
            }
        } else if (kind == 1) {
            const int32_t T = r.i32();
            const double sync = r.f64();
            auto fired = r.vec<uint8_t>((size_t)T * n_axons);
            auto gen = r.vec<double>((size_t)T * n_neurons);
            std::vector<double> sim_time(T);
            for (int32_t nt : {1, 0}) {
                if (sched_run_chunk(h, T, fired.data(), gen.data(), sync,
                                    sim_time.data(), nt) != 0) {
                    std::fprintf(stderr, "run_chunk replay failed\n");
                    return 1;
                }
                consume(sim_time.data(), T);
            }
        } else if (kind == 3) {
            const double sync = r.f64();
            auto fired = r.vec<uint8_t>(n_axons);
            auto gen = r.vec<double>(n_neurons);
            int64_t n_set = 0;
            for (uint8_t b : fired) n_set += b != 0;
            const int64_t cap = n_set + n_cores;
            std::vector<int32_t> axon(cap), src(cap);
            std::vector<double> d0(cap), d1(cap), d2(cap), d3(cap), d4(cap),
                d5(cap), d6(cap), d7(cap);
            double sim_time = 0.0;
            int32_t count = sched_run_timestep_trace(
                h, fired.data(), gen.data(), sync, &sim_time, axon.data(),
                src.data(), d0.data(), d1.data(), d2.data(), d3.data(),
                d4.data(), d5.data(), d6.data(), d7.data());
            if (count < 0 || count > cap) {
                std::fprintf(stderr, "trace replay failed (count=%d)\n",
                             count);
                return 1;
            }
            g_checksum += sim_time;
        } else {
            std::fprintf(stderr, "unknown call kind %d\n", kind);
            return 2;
        }
        ++n_replayed;
    }
    sched_destroy(h);
    std::printf("  replayed %d calls (%d cores, %d axons, %d neurons)\n",
                n_replayed, n_cores, n_axons, n_neurons);
    return 0;
}

// Synthetic edge-case drives of the pure utility exports (zero-size
// inputs, single-element, unaligned counts) — these never cross the
// replay file, so poke them directly.
int utility_smoke() {
    {  // sort_message_trace_order: ties + the n==0 and n==1 edges
        const int64_t keys[] = {5, 5, 1, 9, 1, 5};
        const uint8_t flags[] = {0, 1, 0, 1, 1, 0};
        int32_t order[6];
        if (sort_message_trace_order(keys, flags, 6, order) != 0) return 1;
        int32_t one;
        if (sort_message_trace_order(keys, flags, 1, &one) != 0) return 1;
        if (sort_message_trace_order(keys, flags, 0, nullptr) != 0) return 1;
    }
    {  // serial_keyed_sum_f64: repeated + out-of-order keys
        const double vals[] = {1.0, 2.0, 3.0, 4.0, 5.0};
        const int32_t keys[] = {2, 0, 2, 1, 0};
        double out[3] = {0, 0, 0};
        serial_keyed_sum_f64(vals, keys, 5, out);
        g_checksum += out[0] + out[1] + out[2];
        serial_keyed_sum_f64(vals, keys, 0, out);
    }
    {  // cycle_noc_run: hand-traced vectors from tests/test_cycle_noc.py
       // (defaults width=8 height=4 cores_per_router=4 buffer=8
       // router_delay=2 link_delay=1), every subnets variant, plus a
       // zero-packet run. packet = (src_router, dest_router, src_core,
       // dest_core, ready, proc).
        const int32_t src_r[] = {0, 0, 0};
        const int32_t dst_r[] = {0, 4, 4};
        const int32_t src_c[] = {0, 0, 1};
        const int32_t dst_c[] = {0, 4, 4};
        const int64_t ready[] = {0, 0, 0};
        const int64_t proc[] = {5, 7, 2};
        for (int32_t subnets : {1, 2, 4}) {
            int64_t done[3] = {0, 0, 0};
            int64_t last = cycle_noc_run(8, 4, 4, 8, 2, 1, subnets, 5, 3,
                                         src_r, dst_r, src_c, dst_c, ready,
                                         proc, done);
            if (last < 0) return 1;
            // zero-hop, zero-contention packet: done = 3 + proc = 8 on
            // every subnet count (tests/test_cycle_noc.py:44-50)
            if (done[0] != 8) {
                std::fprintf(stderr, "cycle_noc smoke: done[0]=%lld\n",
                             (long long)done[0]);
                return 1;
            }
            g_checksum += (double)last;
        }
        int64_t last = cycle_noc_run(2, 2, 2, 8, 2, 1, 1, 1, 0, nullptr,
                                     nullptr, nullptr, nullptr, nullptr,
                                     nullptr, nullptr);
        if (last < 0) return 1;
    }
    {  // format_spike_rows: 2 timesteps x 3 labels (bits MSB-first),
       // the cap-exceeded (-1) path, and the T=0 edge
        const uint8_t packed[] = {0b10100000, 0b01000000};
        const int32_t bit_of_label[] = {0, 1, 2};
        const char *blob = "aa" "bbb" "c";
        const int64_t label_off[] = {0, 2, 5, 6};
        uint8_t out[64];
        int64_t n = format_spike_rows(packed, 1, 2, 10, bit_of_label, 3,
                                      (const uint8_t *)blob, label_off, out,
                                      sizeof(out));
        if (n <= 0) return 1;
        g_checksum += (double)n;
        if (format_spike_rows(packed, 1, 2, 10, bit_of_label, 3,
                              (const uint8_t *)blob, label_off, out,
                              2) != -1) {
            return 1;  // tight cap must report overflow, not write past
        }
        if (format_spike_rows(packed, 1, 0, 10, bit_of_label, 3,
                              (const uint8_t *)blob, label_off, out,
                              sizeof(out)) != 0) {
            return 1;
        }
    }
    {  // count_mask_bits(bits, row_stride, T, n_bytes): n_bytes < stride
       // (plane slicing), unaligned widths, and the T=0 edge
        std::vector<uint8_t> masks(7 * 10, 0xA5);
        g_checksum += (double)count_mask_bits(masks.data(), 10, 7, 10);
        g_checksum += (double)count_mask_bits(masks.data(), 10, 7, 5);
        g_checksum += (double)count_mask_bits(masks.data(), 10, 0, 10);
    }
    std::printf("  utility smoke ok\n");
    return 0;
}

}  // namespace

int main(int argc, char **argv) {
    if (argc != 2) {
        std::fprintf(stderr, "usage: %s replay.bin\n", argv[0]);
        return 2;
    }
    FILE *fh = std::fopen(argv[1], "rb");
    if (!fh) {
        std::fprintf(stderr, "cannot open %s\n", argv[1]);
        return 2;
    }
    Reader r{fh, argv[1]};
    const uint64_t magic = (uint64_t)r.i64();
    if (magic != 0x314E41534E415341ull) {
        std::fprintf(stderr, "bad magic in %s\n", argv[1]);
        return 2;
    }
    const int32_t n_scheds = r.i32();
    std::printf("replaying %d scheduler(s) from %s\n", n_scheds, argv[1]);
    for (int32_t s = 0; s < n_scheds; ++s) {
        if (int rc = replay_sched(r)) return rc;
    }
    std::fclose(fh);
    if (int rc = utility_smoke()) return rc;
    std::printf("checksum %.17g\nsanitize replay OK\n", g_checksum);
    return 0;
}
