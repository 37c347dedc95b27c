// Instrumented drop-in for /root/reference/test/ecos.h.
//
// The reference test headers do `#include "ecos.h"`; because they live in
// subdirectories of test/, quote-include falls through to the -I search
// path, and the build puts this directory before /root/reference/test —
// so the UNMODIFIED reference test headers drive the UNMODIFIED reference
// solver through this shim, which additionally records dimensions, exit
// codes, ITERATION COUNTS, objectives and wall-clock per solve as JSON
// lines on stdout (captured into baselines/eicos_reference.json).

#pragma once

#include <chrono>
#include <cstdio>
#include <vector>

#include "eicos.hpp"

using idxint = int;
using pfloat = double;

// name of the test being run; set by runner.cpp before each test
extern const char *g_current_test;

struct pwork
{
    EiCOS::Solver *solver;
    std::vector<double> c;  // for an independent objective check
    int n, m, p, l, ncones;
    int solve_count = 0;
};

inline pwork *ECOS_setup(idxint n, idxint m, idxint p, idxint l,
                         idxint ncones, idxint *q, idxint /*nexc*/,
                         pfloat *Gpr, idxint *Gjc, idxint *Gir,
                         pfloat *Apr, idxint *Ajc, idxint *Air,
                         pfloat *c, pfloat *h, pfloat *b)
{
    pwork *w = new pwork;
    w->solver = new EiCOS::Solver(n, m, p, l, ncones, q, Gpr, Gjc, Gir, Apr,
                                  Ajc, Air, c, h, b);
    w->c.assign(c, c + n);
    w->n = n;
    w->m = m;
    w->p = p;
    w->l = l;
    w->ncones = ncones;
    return w;
}

inline idxint ECOS_solve(pwork *w)
{
    auto t0 = std::chrono::steady_clock::now();
    EiCOS::exitcode code = w->solver->solve();
    double ms = std::chrono::duration<double, std::milli>(
                    std::chrono::steady_clock::now() - t0)
                    .count();
    const EiCOS::Information &info = w->solver->getInfo();
    double obj = 0.0;
    const Eigen::VectorXd &x = w->solver->solution();
    for (int i = 0; i < w->n; i++) obj += w->c[size_t(i)] * x(i);
    std::printf(
        "{\"problem\": \"%s\", \"solve\": %d, \"n\": %d, \"m\": %d, "
        "\"p\": %d, \"l\": %d, \"ncones\": %d, \"exit_code\": %d, "
        "\"iterations\": %zu, \"objective\": %.12e, \"pcost\": %.12e, "
        "\"gap\": %.3e, \"pres\": %.3e, \"dres\": %.3e, "
        "\"solve_ms\": %.3f}\n",
        g_current_test, w->solve_count++, w->n, w->m, w->p, w->l, w->ncones,
        int(code), info.iter, obj, info.pcost, info.gap, info.pres,
        info.dres, ms);
    std::fflush(stdout);
    return idxint(code);
}

inline void ECOS_updateData(pwork *w, pfloat *Gpr, pfloat *Apr, pfloat *c,
                            pfloat *h, pfloat *b)
{
    w->solver->updateData(Gpr, Apr, c, h, b);
    w->c.assign(c, c + w->n);
}

inline void ECOS_cleanup(pwork *w, idxint)
{
    delete w->solver;
    delete w;
}

#define ECOS_OPTIMAL (0)
#define ECOS_PINF (1)
#define ECOS_DINF (2)
#define ECOS_INACC_OFFSET (10)
#define ECOS_MAXIT (-1)
#define ECOS_NUMERICS (-2)
#define ECOS_OUTCONE (-3)
#define ECOS_SIGINT (-4)
#define ECOS_FATAL (-7)
