import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import eicos_tpu
from eicos_tpu.structure import ProblemStructure
from eicos_tpu.problem import make_problem
from eicos_tpu.solver import solve
from eicos_tpu.settings import Settings

# minimize -x1 - x2  s.t. x <= 1 (elementwise), x >= 0
# G x <= h with G = [I; -I], h = [1,1,0,0]
n, m, p, l = 2, 4, 0, 4
G = np.vstack([np.eye(2), -np.eye(2)])
h = np.array([1.0, 1.0, 0.0, 0.0])
c = np.array([-1.0, -1.0])
st = ProblemStructure.create(n, p, m, l, ())
prob = make_problem(st, G, None, c, h, None)
sol = solve(st, prob, Settings())
print("exit:", int(sol.exit_code), "x:", np.asarray(sol.x),
      "pcost:", float(sol.info.pcost), "iters:", int(sol.info.iter))

# SOC: minimize -y s.t. ||(x?)|| ... use unboundedMaxSqrt-like bounded variant:
# minimize -t s.t. t <= 5, (1+x, 2t?) keep simple: min c'x s.t. ||x_tail|| <= x_head via G
# problem: min -x1 s.t. soc: h - Gx in SOC(3), with G=-I, h=[2,0,0] => (2+x0,x1,x2) in SOC... pick:
# min x2 s.t. (x0=2, x1=1, x2) with ||(x1,x2)|| <= x0: infeasibility? Let's do:
# variables (u,v): min -u - v s.t. (3, u, v) in SOC => u^2+v^2 <= 9 => opt u=v=3/sqrt(2)
G2 = np.array([[0.0, 0.0], [-1.0, 0.0], [0.0, -1.0]])
h2 = np.array([3.0, 0.0, 0.0])
c2 = np.array([-1.0, -1.0])
st2 = ProblemStructure.create(2, 0, 3, 0, (3,))
prob2 = make_problem(st2, G2, None, c2, h2, None)
sol2 = solve(st2, prob2, Settings())
print("exit:", int(sol2.exit_code), "x:", np.asarray(sol2.x),
      "expect", 3 / np.sqrt(2), "iters:", int(sol2.info.iter))
