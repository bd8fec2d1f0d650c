#!/usr/bin/env python3
"""Reference-builder oracle for the OpenEDS H5 prep (round-3 verdict item 3).

Runs the reference's own OpenEDSPreparator (/root/reference/data/
prepare_openeds.py:16-138, imageio + joblib) and our
seg2eye_tpu.data.prepare_openeds.OpenEDSPreparator on the SAME synthetic raw
OpenEDS tree (the test suite's make_raw_tree fixture), then compares the two
H5 files dataset-for-dataset: identical group/dataset tree, dtypes, shapes,
chunk layouts, bitwise-equal uint8 content and S13 filename arrays.

Also exercises the --limit path (the reference's post-body break packs
limit+1 users, prepare_openeds.py:109-110 — reproduced).

Usage: python tools/check_prepare_oracle.py [ref_path]
Writes evidence/prepare_oracle.json and exits nonzero on any divergence.
"""
import importlib.util
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_make_raw_tree():
    spec = importlib.util.spec_from_file_location(
        "test_prepare_openeds",
        os.path.join(REPO, "tests", "test_prepare_openeds.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_raw_tree


def h5_tree(f):
    """{path: (kind, dtype, shape, chunks)} for every group/dataset."""
    import h5py
    out = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            out[name] = ("dataset", str(obj.dtype), tuple(obj.shape),
                         obj.chunks)
        else:
            out[name] = ("group", None, None, None)

    f.visititems(visit)
    return out


def compare(ref_h5, our_h5, tag):
    import h5py
    import numpy as np

    ok, n_ds, n_bytes = True, 0, 0
    with h5py.File(ref_h5, "r") as fr, h5py.File(our_h5, "r") as fo:
        tr, to = h5_tree(fr), h5_tree(fo)
        if set(tr) != set(to):
            print(f"FAIL {tag} tree: ref-only={sorted(set(tr) - set(to))} "
                  f"ours-only={sorted(set(to) - set(tr))}")
            ok = False
        for name in sorted(set(tr) & set(to)):
            if tr[name] != to[name]:
                print(f"FAIL {tag} meta {name}: ref={tr[name]} "
                      f"ours={to[name]}")
                ok = False
                continue
            if tr[name][0] != "dataset":
                continue
            a, b = fr[name][:], fo[name][:]
            if not np.array_equal(a, b):
                print(f"FAIL {tag} content {name}")
                ok = False
            n_ds += 1
            n_bytes += a.nbytes
    print(f"{'OK ' if ok else 'FAIL'} {tag}: {n_ds} datasets "
          f"({n_bytes} bytes) bitwise-compared "
          f"({len(tr)} tree entries incl. groups/chunks/dtypes)")
    return ok, n_ds, n_bytes


def main(ref="/root/reference"):
    from tools import _ref_compat

    # stub torchvision (reference data/__init__.py -> base_dataset imports it)
    _ref_compat.stub_torchvision()
    _ref_compat.add_reference_path(ref)
    from data.prepare_openeds import OpenEDSPreparator as RefPreparator

    from seg2eye_tpu.data.prepare_openeds import (
        OpenEDSPreparator as OurPreparator)

    make_raw_tree = load_make_raw_tree()
    results, ok = {}, True
    for tag, users, limit in (("full", ("U1", "U2"), -1),
                              ("limit1", ("U1", "U2", "U3"), 1)):
        with tempfile.TemporaryDirectory() as root:
            make_raw_tree(root, users=users)
            RefPreparator(base_path=root, limit=limit, n_jobs=1,
                          out_filename="ref.h5").run()
            OurPreparator(root, limit=limit, n_jobs=1,
                          out_filename="ours.h5").run()
            good, n_ds, n_bytes = compare(os.path.join(root, "ref.h5"),
                                          os.path.join(root, "ours.h5"), tag)
            ok &= good
            results[tag] = {"ok": good, "datasets": n_ds, "bytes": n_bytes,
                            "users": len(users), "limit": limit}

    out_path = os.path.join(REPO, "evidence", "prepare_oracle.json")
    with open(out_path, "w") as f:
        json.dump({"oracle": "reference data/prepare_openeds.py:16-138 run "
                             "on the synthetic raw tree vs our builder",
                   "results": results, "pass": bool(ok)}, f, indent=1)
    print("PREPARE ORACLE:", "PASS" if ok else "FAIL", f"-> {out_path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
