// Reference-EiCOS throughput benchmark on the SAME problem instances as
// bench.py's TPU lanes: loads a problem dump written by
// tools/ref_baseline.py (dims + CSC data + per-lane (c, b) variants),
// then runs the reference's updateData fast-path loop
// (/root/reference/src/run.cpp:43-50 shape): setup once, then for each
// variant updateData + solve.  Prints one JSON line.
//
// Built against mini_eigen.hpp, so absolute times are a lower bound on
// the real Eigen's speed (RCM simplicial LDL^T vs Eigen's AMD); recorded
// as such in baselines/eicos_reference.json.

#include <chrono>
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <algorithm>
#include <vector>

#include "eicos.hpp"

static void die(const char *msg)
{
    std::fprintf(stderr, "bench_ref: %s\n", msg);
    std::exit(1);
}

template <typename T> static std::vector<T> rd(std::FILE *f, size_t k)
{
    std::vector<T> v(k);
    if (k && std::fread(v.data(), sizeof(T), k, f) != k) die("short read");
    return v;
}

int main(int argc, char **argv)
{
    if (argc < 2) die("usage: bench_ref <dump.bin>");
    std::FILE *f = std::fopen(argv[1], "rb");
    if (!f) die("cannot open dump");
    auto hdr = rd<int32_t>(f, 5);
    int n = hdr[0], m = hdr[1], p = hdr[2], l = hdr[3], ncones = hdr[4];
    auto q = rd<int32_t>(f, size_t(ncones));
    auto gnnz = rd<int32_t>(f, 1);
    auto Gjc = rd<int32_t>(f, size_t(n) + 1);
    auto Gir = rd<int32_t>(f, size_t(gnnz[0]));
    auto Gpr = rd<double>(f, size_t(gnnz[0]));
    auto annz = rd<int32_t>(f, 1);
    auto Ajc = rd<int32_t>(f, size_t(n) + 1);
    auto Air = rd<int32_t>(f, size_t(annz[0]));
    auto Apr = rd<double>(f, size_t(annz[0]));
    auto c = rd<double>(f, size_t(n));
    auto h = rd<double>(f, size_t(m));
    auto b = rd<double>(f, size_t(p));
    auto nvar = rd<int32_t>(f, 1);
    std::vector<std::vector<double>> cs, bs;
    for (int i = 0; i < nvar[0]; i++) {
        cs.push_back(rd<double>(f, size_t(n)));
        bs.push_back(rd<double>(f, size_t(p)));
    }
    std::fclose(f);

    EiCOS::Solver solver(n, m, p, l, ncones, q.data(), Gpr.data(),
                         Gjc.data(), Gir.data(), p ? Apr.data() : nullptr,
                         p ? Ajc.data() : nullptr, p ? Air.data() : nullptr,
                         c.data(), h.data(), b.data());
    // warm solve (symbolic etc.)
    (void)solver.solve();

    std::vector<double> ms;
    std::vector<int> codes;
    int n_optimal = 0;
    for (int i = 0; i < nvar[0]; i++) {
        solver.updateData(Gpr.data(), p ? Apr.data() : nullptr,
                          cs[size_t(i)].data(), h.data(),
                          bs[size_t(i)].data());
        auto t0 = std::chrono::steady_clock::now();
        EiCOS::exitcode code = solver.solve();
        ms.push_back(std::chrono::duration<double, std::milli>(
                         std::chrono::steady_clock::now() - t0)
                         .count());
        codes.push_back(int(code));
        n_optimal += (code == EiCOS::exitcode::optimal
                      || code == EiCOS::exitcode::close_to_optimal);
    }
    std::sort(ms.begin(), ms.end());
    double med = ms[ms.size() / 2];
    std::printf(
        "{\"n\": %d, \"m\": %d, \"p\": %d, \"variants\": %d, "
        "\"optimal\": %d, \"median_solve_ms\": %.3f, "
        "\"solves_per_sec\": %.3f, \"codes\": [",
        n, m, p, int(ms.size()), n_optimal, med, 1000.0 / med);
    for (size_t i = 0; i < codes.size(); i++)
        std::printf("%s%d", i ? ", " : "", codes[i]);
    std::printf("]}\n");
    return 0;
}
