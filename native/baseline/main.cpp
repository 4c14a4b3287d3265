// Self-measured AVX2 baseline driver.
//
// BASELINE.md: the reference publishes no numbers, so the baseline must be
// measured by running the reference itself on this machine's CPU.  This
// driver #includes the read-only reference headers (it copies nothing into
// this repo) and runs the same synthetic workload as bench.py, emitting one
// JSON line consumed as bench.py's vs_baseline denominator.
//
// Build: see native/measure_reference.py (g++ -O3 -mavx2 -mfma -fopenmp
//        -I/root/reference/include).

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>
#include <vector>

#include <cphnsw/api/hnsw_index.hpp>

using Clock = std::chrono::steady_clock;

static std::vector<float> read_f32(const std::string& path, size_t count) {
    std::ifstream f(path, std::ios::binary);
    if (!f) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(1); }
    std::vector<float> v(count);
    f.read(reinterpret_cast<char*>(v.data()), count * sizeof(float));
    return v;
}

static std::vector<int32_t> read_i32(const std::string& path, size_t count) {
    std::ifstream f(path, std::ios::binary);
    if (!f) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(1); }
    std::vector<int32_t> v(count);
    f.read(reinterpret_cast<char*>(v.data()), count * sizeof(int32_t));
    return v;
}

int main(int argc, char** argv) {
    if (argc < 7) {
        std::fprintf(stderr,
            "usage: %s <dir> <n> <dim> <n_queries> <k> <bits>\n", argv[0]);
        return 1;
    }
    const std::string dir = argv[1];
    const size_t n = std::strtoull(argv[2], nullptr, 10);
    const size_t dim = std::strtoull(argv[3], nullptr, 10);
    const size_t nq = std::strtoull(argv[4], nullptr, 10);
    const size_t k = std::strtoull(argv[5], nullptr, 10);
    const int bits = std::atoi(argv[6]);

    auto base = read_f32(dir + "/base.raw", n * dim);
    auto queries = read_f32(dir + "/queries.raw", nq * dim);
    auto gt = read_i32(dir + "/gt.raw", nq * k);

    if (dim != 128 || bits != 1) {
        std::fprintf(stderr, "driver compiled for dim<=128 pad, 1-bit only\n");
        return 1;
    }

    auto t0 = Clock::now();
    cphnsw::Index<128, 32, 1> index(dim);
    index.build(base.data(), n);
    index.finalize();
    double build_s =
        std::chrono::duration<double>(Clock::now() - t0).count();

    std::vector<std::vector<cphnsw::SearchResult>> results(nq);
    auto run_batch = [&]() {
        #pragma omp parallel for schedule(dynamic, 16)
        for (size_t i = 0; i < nq; ++i) {
            results[i] = index.search(queries.data() + i * dim, k);
        }
    };

    run_batch();  // warmup
    double best = 1e30;
    for (int rep = 0; rep < 3; ++rep) {
        auto t1 = Clock::now();
        run_batch();
        double dt = std::chrono::duration<double>(Clock::now() - t1).count();
        if (dt < best) best = dt;
    }
    double qps = nq / best;

    // recall@k vs ground truth (note: reference returns BFS-internal ids;
    // recall is computed on distance-matching instead to stay fair)
    // Distance-match: result distance must match one of the gt distances.
    size_t hits = 0;
    for (size_t i = 0; i < nq; ++i) {
        for (size_t j = 0; j < results[i].size() && j < k; ++j) {
            float rd = results[i][j].distance;
            for (size_t g = 0; g < k; ++g) {
                const float* bv = base.data() + size_t(gt[i * k + g]) * dim;
                const float* qv = queries.data() + i * dim;
                float d = 0.0f;
                for (size_t t = 0; t < dim; ++t) {
                    float df = qv[t] - bv[t];
                    d += df * df;
                }
                if (std::abs(d - rd) <= 1e-3f * (1.0f + d)) { hits++; break; }
            }
        }
    }
    double recall = double(hits) / double(nq * k);

    std::printf(
        "{\"qps\": %.1f, \"recall_at_k\": %.4f, \"build_s\": %.2f, "
        "\"n\": %zu, \"dim\": %zu, \"k\": %zu, \"bits\": %d}\n",
        qps, recall, build_s, n, dim, k, bits);
    return 0;
}
