#!/usr/bin/env python
"""Generate a5spark/kernels/lsystem_tables.py: the compiled A5 L-system curve
tables, dumped as literals from the reference library (same data-extraction
precedent as the compat curve's W/Z tables — the tables are the public curve
DEFINITION, the consuming descent code in kernels/lsystem.py is ours).

Run: python scripts/gen_lsystem_tables.py   (requires /root/reference)
"""

import os
import sys

REF = os.environ.get("A5_REFERENCE_ROOT", "/root/reference")
sys.path.insert(0, REF)

from a5.lattice.lsystem import A5  # noqa: E402
from a5.lattice.lsystem.tables import BSP_EPS  # noqa: E402


def fmt_floats(xs):
    return "[" + ", ".join(repr(float(x)) for x in xs) + "]"


def fmt_ints(xs):
    return "[" + ", ".join(str(int(x)) for x in xs) + "]"


def main():
    out = []
    out.append('"""Compiled A5 L-system curve tables (generated — do not edit).')
    out.append("")
    out.append("Source: scripts/gen_lsystem_tables.py, which dumps the reference")
    out.append("library's compiled grammar (a5/lattice/lsystem/tables.py" )
    out.append("compile_grammar over the public A5 grammar). The tables are the")
    out.append("curve's DEFINITION (data); the descents that consume them live in")
    out.append('kernels/lsystem.py."""')
    out.append("")
    out.append(f"BSP_EPS = {BSP_EPS!r}")
    out.append(f"MOTIF_IDX = {dict(A5.motif_idx)!r}")
    out.append(f"CHILD_TOKEN = {fmt_ints(A5.child_token)}")
    out.append(f"CHILD_FLIP = {fmt_ints(A5.child_flip)}")
    out.append(f"CHILD_OFF_A = {fmt_floats(A5.child_off_a)}")
    out.append(f"CHILD_OFF_B = {fmt_floats(A5.child_off_b)}")
    out.append("FP_EDGES = [")
    for edges in A5.fp_edges:
        out.append(f"    {fmt_floats(edges)},")
    out.append("]")
    out.append(f"LEAF_SUM = {fmt_floats(A5.leaf_sum)}")
    out.append(f"LEAF_TRI = {fmt_floats(A5.leaf_tri)}")
    out.append(f"LEAF_FLAVOR = {fmt_ints(A5.leaf_flavor)}")
    out.append(f"CLASS_SEP = {fmt_floats(A5.class_sep)}")
    out.append(f"CLASS_LUT = {fmt_ints(A5.class_lut)}")
    out.append("")
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "a5spark", "kernels", "lsystem_tables.py",
    )
    with open(dst, "w") as f:
        f.write("\n".join(out))
    print(dst, f"({os.path.getsize(dst)} bytes)")


if __name__ == "__main__":
    main()
