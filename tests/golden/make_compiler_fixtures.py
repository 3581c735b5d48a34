"""Golden compiler-output fixtures: run the REFERENCE kform/system/eval
compiler (via a one-class shim of its C extension) and record the
pretty-printed lowered systems.  ``test_reference_parity.py`` asserts
mfv2d_tpu's compiler produces byte-identical output — pinning the whole
DSL -> IR -> simplification pipeline against the reference.

Run from the repo root:  python tests/golden/make_compiler_fixtures.py
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference/python")
OUT = Path(__file__).parent / "reference_compiler_strings.txt"


def _install_shim() -> None:
    class _ElementFormSpecification(tuple):
        def __new__(cls, *specs):
            return super().__new__(
                cls, tuple((str(l), int(o)) for l, o in specs)
            )

    ext = types.ModuleType("mfv2d._mfv2d")
    ext._ElementFormSpecification = _ElementFormSpecification
    pkg = types.ModuleType("mfv2d")
    pkg.__path__ = [str(REFERENCE / "mfv2d")]
    pkg._mfv2d = ext
    sys.modules["mfv2d"] = pkg
    sys.modules["mfv2d._mfv2d"] = ext


def u_exact(x, y):
    return x


def source_exact(x, y):
    return x


def vec_field(x, y):
    return np.stack((x, y), axis=-1)


def build_systems(kform, system_mod):
    """The four compiler-parity systems, in either implementation's DSL."""
    KFormUnknown = kform.KFormUnknown
    UnknownFormOrder = kform.UnknownFormOrder
    KFormSystem = system_mod.KFormSystem

    def mixed_poisson():
        u = KFormUnknown("u", UnknownFormOrder.FORM_ORDER_2)
        v = u.weight
        q = KFormUnknown("q", UnknownFormOrder.FORM_ORDER_1)
        p = q.weight
        return KFormSystem(
            p.derivative @ u - p @ q == p ^ u_exact,
            v @ q.derivative == -(v @ source_exact),
        )

    def direct_poisson():
        u = KFormUnknown("u", UnknownFormOrder.FORM_ORDER_0)
        v = u.weight
        q = KFormUnknown("q", UnknownFormOrder.FORM_ORDER_1)
        p = q.weight
        return KFormSystem(
            v.derivative @ u.derivative == -(v @ source_exact),
            p @ u.derivative - p @ q == 0,
            sorting=lambda f: f.order,
        )

    def advection():
        u = KFormUnknown("u", UnknownFormOrder.FORM_ORDER_2)
        v = u.weight
        q = KFormUnknown("q", UnknownFormOrder.FORM_ORDER_1)
        p = q.weight
        return KFormSystem(
            p @ q + p.derivative @ u == p ^ u_exact,
            v @ q.derivative - (vec_field * v @ q) == v @ source_exact,
        )

    def navier_stokes():
        pre = KFormUnknown("pre", UnknownFormOrder.FORM_ORDER_2)
        w_pre = pre.weight
        vel = KFormUnknown("vel", UnknownFormOrder.FORM_ORDER_1)
        w_vel = vel.weight
        vor = KFormUnknown("vor", UnknownFormOrder.FORM_ORDER_0)
        w_vor = vor.weight
        return KFormSystem(
            w_vor.derivative @ vel - w_vor @ vor == w_vor ^ u_exact,
            0.01 * (w_vel @ vor.derivative) + w_vel.derivative @ pre
            == w_vel @ vec_field - (vel * w_vel @ vor),
            (w_pre @ vel.derivative) == 0,
        )

    return [
        ("mixed_poisson", mixed_poisson),
        ("direct_poisson", direct_poisson),
        ("advection", advection),
        ("navier_stokes", navier_stokes),
    ]


def render(kform, system_mod, system_as_string) -> str:
    parts = []
    for name, make in build_systems(kform, system_mod):
        parts.append(f"==== {name} ====")
        parts.append(system_as_string(make()))
    return "\n".join(parts) + "\n"


def main() -> None:
    _install_shim()
    from mfv2d import eval as ref_eval
    from mfv2d import kform as ref_kform
    from mfv2d import system as ref_system

    OUT.write_text(
        render(ref_kform, ref_system, ref_eval.system_as_string)
    )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    main()
