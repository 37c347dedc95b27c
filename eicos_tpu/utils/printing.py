"""Human-readable solver output (the analogue of the reference's verbose
table and printSummary, /root/reference/src/eicos.cpp:189-206, 733-753).
All printing is host-side, from the returned Solution — the device loop
never syncs to print."""

from __future__ import annotations

import numpy as np

from ..exitcodes import ExitCode


def print_iteration_table(solution) -> None:
    """Reference-style per-iteration table (src/eicos.cpp:741-752), rendered
    host-side from the returned History arrays."""
    h = solution.history
    n_it = int(solution.info.iter)
    print("It     pcost       dcost      gap   pres   dres    k/t    mu"
          "     step   sigma     IR")
    for i in range(n_it + 1):
        line = (f"{i:2d}  {float(h.pcost[i]):+5.3e}  "
                f"{float(h.dcost[i]):+5.3e}  {float(h.gap[i]):+2.0e}  "
                f"{float(h.pres[i]):2.0e}  {float(h.dres[i]):2.0e}  "
                f"{float(h.kapovert[i]):2.0e}  {float(h.mu[i]):2.0e}")
        if i == 0:
            print(f"{line}    ---    ---   "
                  f"{int(h.nitref1[i]):2d}/{int(h.nitref2[i]):2d}  -")
        else:
            print(f"{line}  {float(h.step[i]):6.4f}  "
                  f"{float(h.sigma[i]):2.0e}  {int(h.nitref1[i]):2d}/"
                  f"{int(h.nitref2[i]):2d}/{int(h.nitref3[i]):2d}")


def print_summary(structure, solution) -> None:
    info = solution.info
    code = ExitCode(int(solution.exit_code))
    print("- - - - - - - - - - - - - - -")
    print("|      Problem summary      |")
    print("- - - - - - - - - - - - - - -")
    print(f"    Primal variables:  {structure.n}")
    print(f"Equality constraints:  {structure.p}")
    print(f"     Conic variables:  {structure.m}")
    print(f"  Size of LP cone:     {structure.l}")
    print(f"  Number of SOCs:      {structure.n_sc}")
    print("- - - - - - - - - - - - - - -")
    print(f"exit:   {code.name} ({int(code)})")
    print(f"iters:  {int(info.iter)}")
    print(f"pcost:  {float(info.pcost):+.9e}")
    print(f"dcost:  {float(info.dcost):+.9e}")
    print(f"gap:    {float(info.gap):.3e}   pres: {float(info.pres):.3e}"
          f"   dres: {float(info.dres):.3e}")
    print(f"k/t:    {float(info.kapovert):.3e}   mu: {float(info.mu):.3e}")
