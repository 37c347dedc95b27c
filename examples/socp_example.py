"""SOCP example: robust least squares via second-order cones.

    minimize_x  ||Fx - g||_2 + rho * ||x||_2

Cast to the solver's conic form with epigraph variables (t1, t2):

    minimize    t1 + rho*t2
    subject to  ||Fx - g|| <= t1      (SOC of dim k+1)
                ||x||      <= t2      (SOC of dim n+1)

Demonstrates mixed LP + SOC cones through the high-level API, checked
against a closed-form/scipy reference.

Run:  python examples/socp_example.py
"""

import numpy as np


def main():
    import eicos_tpu
    from eicos_tpu import ExitCode, Solver

    rng = np.random.default_rng(0)
    k, nx = 20, 8
    rho = 0.5
    F = rng.standard_normal((k, nx))
    g = rng.standard_normal(k)

    # variables: [x (nx), t1, t2]
    n = nx + 2
    c = np.zeros(n)
    c[nx] = 1.0
    c[nx + 1] = rho

    # SOC rows: h - Gz in K means for ||Fx-g|| <= t1:
    #   head: t1  -> G[0, nx] = -1, h[0] = 0
    #   tail: Fx - g -> G[1:k+1, :nx] = -F, h[1:k+1] = -g
    m1 = k + 1
    m2 = nx + 1
    G = np.zeros((m1 + m2, n))
    h = np.zeros(m1 + m2)
    G[0, nx] = -1.0
    G[1:m1, :nx] = -F
    h[1:m1] = -g
    G[m1, nx + 1] = -1.0
    G[m1 + 1:, :nx] = -np.eye(nx)

    solver = Solver(G, None, c, h, None, soc_dims=(m1, m2))
    code = solver.solve(verbose=True)
    assert code == ExitCode.OPTIMAL, code
    x = solver.solution()[:nx]

    # reference via scipy general-purpose minimization
    from scipy.optimize import minimize

    obj = lambda v: np.linalg.norm(F @ v - g) + rho * np.linalg.norm(v)  # noqa: E731
    ref = minimize(obj, np.zeros(nx), method="Nelder-Mead",
                   options={"maxiter": 20000, "xatol": 1e-10,
                            "fatol": 1e-12})
    print(f"\nours:  obj = {obj(x):.9f}")
    print(f"scipy: obj = {ref.fun:.9f}")
    assert obj(x) <= ref.fun + 1e-6, "conic solution must match or beat NM"
    print("OK")


if __name__ == "__main__":
    main()
