// Baseline runner: drives the UNMODIFIED reference EiCOS solver
// (/root/reference/src/eicos.cpp, compiled against mini_eigen.hpp)
// through the UNMODIFIED reference test headers, via the instrumented
// shim/ecos.h.  Emits one JSON line per solve on stdout with exit code,
// iteration count, objective, and wall-clock; tools/ref_baseline.py
// collects them into baselines/eicos_reference.json.
//
// MPC01 is excluded: its data header is a missing blob in the reference
// snapshot (/root/reference/.MISSING_LARGE_BLOBS).

#include <cstdio>

int tests_run = 0;
int mu_failures = 0;
const char *g_current_test = "";

#include "MPC/MPC02.h"
#include "updateData/update_data.h"
#include "cvxpyProblems/githubIssue98.h"
#include "feasibilityProblems/feas.h"
#include "unboundedProblems/unboundedLP1.h"
#include "infeasibleProblems/infeasible1.h"
#include "unboundedProblems/unboundedMaxSqrt.h"
#include "emptyProblem/emptyProblem.h"
#include "LPnetlib/lp_25fv47.h"
#include "LPnetlib/lp_adlittle.h"
#include "LPnetlib/lp_afiro.h"
#include "LPnetlib/lp_agg.h"
#include "LPnetlib/lp_agg2.h"
#include "LPnetlib/lp_agg3.h"
#include "LPnetlib/lp_bandm.h"
#include "LPnetlib/lp_beaconfd.h"
#include "LPnetlib/lp_blend.h"
#include "LPnetlib/lp_bnl1.h"

#define RUN(name)                                                         \
    do {                                                                  \
        g_current_test = #name;                                           \
        char *msg = mu_run_test(test_##name);                             \
        if (msg) std::printf("{\"test_message\": \"%s\"}\n", msg);        \
    } while (0)

int main()
{
    RUN(MPC02);
    RUN(update_data);
    RUN(issue98);
    RUN(feas);
    RUN(unboundedLP1);
    RUN(infeasible1);
    RUN(unboundedMaxSqrt);
    RUN(emptyProblem);
    RUN(lp_25fv47);
    RUN(lp_adlittle);
    RUN(lp_afiro);
    RUN(lp_agg);
    RUN(lp_agg2);
    RUN(lp_agg3);
    RUN(lp_bandm);
    RUN(lp_beaconfd);
    RUN(lp_blend);
    RUN(lp_bnl1);
    std::printf("{\"tests_run\": %d, \"assert_failures\": %d}\n",
                tests_run, mu_failures);
    return mu_failures != 0;
}
