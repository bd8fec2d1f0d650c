"""Driver-contract surfaces: entry() is jittable; the tiny-mesh dryrun path
compiles (full 8-device dryrun is exercised by `python __graft_entry__.py 8`
and by the driver)."""
import jax
import jax.numpy as jnp


def test_entry_shapes_jittable():
    import __graft_entry__ as g
    fn, args = g.entry()
    # compile-check without running the full-size computation
    out = jax.eval_shape(fn, *args)
    variables, label, style = args
    assert out.shape == (label.shape[0], 320, 256, 1)


def test_bench_json_contract():
    """bench.py must emit exactly the 4-key JSON line (checked statically —
    running it needs the real chip)."""
    import ast
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    src = open(path).read()
    assert '"metric": "train_images_per_sec_chip"' in src or \
        "'metric'" in src or "metric" in src
    tree = ast.parse(src)
    keys = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            for k in node.keys:
                if isinstance(k, ast.Constant):
                    keys.add(k.value)
    assert {"metric", "value", "unit", "vs_baseline"} <= keys
