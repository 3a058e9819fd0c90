"""Dev driver for the even derivation: stage-by-stage with /tmp caching."""

import pickle
import sys
import time

import sympy as sp

from .derive_even import (
    _dsub,
    _rat_point,
    _vacuum_subs,
    darboux_partner,
    field_equations,
    master_even,
    omega,
    reduce_system,
)
from .gr import L, M, r

T0 = time.time()


def tick(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


CACHE = "/tmp/rwz_even_eqs.pkl"


def load_eqs():
    import os

    if os.path.exists(CACHE):
        with open(CACHE, "rb") as fh:
            blob = pickle.load(fh)
        eqs = {k: sp.sympify(v) for k, v in blob["eqs"].items()}
        fields = {k: sp.Function(k)(r) for k in ("H0", "H1", "H2", "K")}
        Q = {k: sp.Function(k)(r) for k in
             ("Qtt", "Qtr", "Qrr", "Qtv", "Qrv", "Qu", "Qz")}
        tick("eqs loaded from cache")
        return eqs, fields, Q
    eqs, fields, Q = field_equations()
    with open(CACHE, "wb") as fh:
        pickle.dump({"eqs": {k: sp.srepr(v) for k, v in eqs.items()}}, fh)
    tick("eqs derived + cached")
    return eqs, fields, Q


if __name__ == "__main__":
    eqs, fields, Q = load_eqs()
    V_Z, W, kappa = darboux_partner()
    tick("darboux")
    sys_ = reduce_system(eqs, fields, Q)
    tick("system reduced")
    with open("/tmp/rwz_even_sys.pkl", "wb") as fh:
        pickle.dump(
            {k: sp.srepr(sys_[k]) for k in ("kp", "h1p", "h2_of")}, fh
        )
    alpha, beta, S_even = master_even(sys_, V_Z)
    tick("master found")
    print("alpha =", alpha)
    print("beta =", beta)
    with open("/tmp/rwz_even_master.pkl", "wb") as fh:
        pickle.dump(
            {
                "alpha": sp.srepr(alpha),
                "beta": sp.srepr(beta),
                "S_even": sp.srepr(S_even),
                "V_Z": sp.srepr(V_Z),
            },
            fh,
        )
    tick("done")
