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


def test_collective_traffic_parser():
    """The dryrun's static scaling check parses optimized-HLO collectives:
    result bytes per op type, counting -start forms once and skipping
    -done echoes."""
    import __graft_entry__ as g
    hlo = """
  %ar = f32[1024,256]{1,0} all-reduce(f32[1024,256] %p0), replica_groups={}
  %ag.s = (bf16[64]{0}, bf16[64]{0}) all-gather-start(bf16[32] %x), dim=0
  %ag.d = bf16[64]{0} all-gather-done((bf16[64], bf16[64]) %ag.s)
  %cp = f32[16,8]{1,0} collective-permute(f32[16,8] %y), pairs={{0,1}}
  %rs = (f32[128]{0}) reduce-scatter(f32[1024] %z), dimensions={0}
  %no = f32[4]{0} add(f32[4] %a, f32[4] %b)
"""
    totals, counts = g.collective_traffic(hlo)
    assert totals["all-reduce"] == 1024 * 256 * 4 and counts["all-reduce"] == 1
    assert totals["all-gather"] == 2 * 64 * 2 and counts["all-gather"] == 1
    assert totals["collective-permute"] == 16 * 8 * 4
    assert totals["reduce-scatter"] == 128 * 4
    assert counts["all-to-all"] == 0


def test_segnet_dp_dryrun_runs():
    """The driver's MULTICHIP artifact must certify BOTH training systems
    (round-3 verdict item 4): execute the SegNet DP dryrun — one real SGD
    step on the 8-device mesh plus its collective-traffic bound — exactly
    as dryrun_multichip invokes it."""
    import __graft_entry__ as g
    g._dryrun_segnet_dp(8)


def test_dp_step_collectives_are_bounded():
    """Compile the TINY fused G+D step pure-DP over the 8-device mesh and
    assert the gradient all-reduce volume is O(param bytes) with no
    parameter all-gather — the same static scaling check the full-config
    dryrun runs, kept cheap enough for the suite."""
    import numpy as np
    import __graft_entry__ as g
    from seg2eye_tpu.models.pix2pix import Pix2Pix
    from seg2eye_tpu.parallel.sharding import make_mesh, param_shardings
    from seg2eye_tpu.train import state as state_lib
    from seg2eye_tpu.train.steps import StepFunctions
    from jax.sharding import NamedSharding, PartitionSpec as P

    opt = g._tiny_opt(batchSize=8, data_axis=8, model_axis=1)
    model = Pix2Pix(opt)
    mesh = make_mesh(opt, data=8, model=1)
    state_shapes = jax.eval_shape(
        lambda rng: state_lib.create_state(model, rng), jax.random.PRNGKey(0))
    shardings = param_shardings(state_shapes, mesh)
    state_abs = jax.tree_util.tree_map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        state_shapes, shardings)
    h, w = opt.image_height, opt.image_width
    dsh = lambda *shape, dtype=np.float32: jax.ShapeDtypeStruct(  # noqa: E731
        shape, dtype,
        sharding=NamedSharding(mesh, P("data", *([None] * (len(shape) - 1)))))
    batch_abs = {"label": dsh(8, h, w, dtype=np.int64),
                 "style_image": dsh(8, opt.input_ns, h, w, 1),
                 "target": dsh(8, h, w, 1)}
    steps = StepFunctions(model, donate=False)
    with mesh:
        compiled = steps.train_step.lower(state_abs, batch_abs).compile()
    totals, _ = g.collective_traffic(compiled.as_text())
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(
                       {k: state_shapes.variables[k]["params"]
                        for k in ("G", "E", "D")}))
    param_bytes = 4 * n_params
    assert 0.25 * param_bytes <= totals["all-reduce"] <= 3 * param_bytes
    assert totals["all-gather"] < 0.05 * param_bytes
