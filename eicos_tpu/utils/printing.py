"""Human-readable solver output (the analogue of the reference's verbose
table and printSummary, /root/reference/src/eicos.cpp:189-206, 733-753).
Default printing is host-side, from the returned Solution — the device
loop never syncs to print.  ``Settings(verbose_live=True)`` additionally
streams each row DURING the solve via ``jax.debug.callback`` (the
analogue of the reference printing inside updateStatistics) for runtime
visibility into long or hung solves; off by default so the hot path
stays sync-free."""

from __future__ import annotations

import numpy as np

from ..exitcodes import ExitCode

_HEADER = ("It     pcost       dcost      gap   pres   dres    k/t    mu"
           "     step   sigma     IR")


def format_iteration_row(i, pcost, dcost, gap, pres, dres, kapovert, mu,
                         step, sigma, n1, n2, n3) -> str:
    """One reference-style table row (src/eicos.cpp:741-752)."""
    line = (f"{i:2d}  {pcost:+5.3e}  {dcost:+5.3e}  {gap:+2.0e}  "
            f"{pres:2.0e}  {dres:2.0e}  {kapovert:2.0e}  {mu:2.0e}")
    if i == 0:
        return f"{line}    ---    ---   {n1:2d}/{n2:2d}  -"
    return f"{line}  {step:6.4f}  {sigma:2.0e}  {n1:2d}/{n2:2d}/{n3:2d}"


def live_row_callback(i, pcost, dcost, gap, pres, dres, kapovert, mu,
                      step, sigma, n1, n2, n3) -> None:
    """jax.debug.callback target: stream one row mid-solve.  Intended for
    single-problem solves; under vmap the arguments arrive batched and
    only lane 0 is shown."""
    args = [np.asarray(v).reshape(-1)[0] for v in
            (i, pcost, dcost, gap, pres, dres, kapovert, mu, step, sigma,
             n1, n2, n3)]
    i0 = int(args[0])
    if i0 == 0:
        print(_HEADER, flush=True)
    print(format_iteration_row(
        i0, *(float(v) for v in args[1:10]),
        *(int(v) for v in args[10:])), flush=True)


def print_iteration_table(solution) -> None:
    """Reference-style per-iteration table (src/eicos.cpp:741-752), rendered
    host-side from the returned History arrays."""
    h = solution.history
    n_it = int(solution.info.iter)
    print(_HEADER)
    for i in range(n_it + 1):
        print(format_iteration_row(
            i, float(h.pcost[i]), float(h.dcost[i]), float(h.gap[i]),
            float(h.pres[i]), float(h.dres[i]), float(h.kapovert[i]),
            float(h.mu[i]), float(h.step[i]), float(h.sigma[i]),
            int(h.nitref1[i]), int(h.nitref2[i]), int(h.nitref3[i])))


def print_summary(structure, solution, file=None) -> None:
    import sys

    out = file if file is not None else sys.stdout
    info = solution.info
    code = ExitCode(int(solution.exit_code))

    def p(line=""):
        print(line, file=out)

    p("- - - - - - - - - - - - - - -")
    p("|      Problem summary      |")
    p("- - - - - - - - - - - - - - -")
    p(f"    Primal variables:  {structure.n}")
    p(f"Equality constraints:  {structure.p}")
    p(f"     Conic variables:  {structure.m}")
    p(f"  Size of LP cone:     {structure.l}")
    p(f"  Number of SOCs:      {structure.n_sc}")
    p("- - - - - - - - - - - - - - -")
    p(f"exit:   {code.name} ({int(code)})")
    p(f"iters:  {int(info.iter)}")
    p(f"pcost:  {float(info.pcost):+.9e}")
    p(f"dcost:  {float(info.dcost):+.9e}")
    p(f"gap:    {float(info.gap):.3e}   pres: {float(info.pres):.3e}"
      f"   dres: {float(info.dres):.3e}")
    p(f"k/t:    {float(info.kapovert):.3e}   mu: {float(info.mu):.3e}")
