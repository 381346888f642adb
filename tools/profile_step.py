"""Profile the flagship train step: HLO dot inventory + device-lane op times.

Usage:
    python tools/profile_step.py [--hlo] [--trace] [--fast]

--hlo    lower+compile the bench train step and summarize every dot/conv in
         the optimized HLO (dtype, shape, est. GFLOP) — catches f32 matmuls
         that silently quarter MXU throughput.
--trace  run 5 profiled steps and aggregate device-lane op durations by
         fusion name — the honest per-op cost breakdown.
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/openasr_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def build_step(model_name="flagship"):
    import jax
    import jax.numpy as jnp
    import bench
    from openasr_tpu.config import Config
    from openasr_tpu.models import get_model_class
    from openasr_tpu.parallel import make_mesh, shard_batch
    from openasr_tpu.solvers import array_fields, get_solver_class

    cfg_factory = {"flagship": bench.flagship_cfg, "cif": bench.cif_cfg,
                   "wide": bench.wide_cfg, "online": bench.online_cfg}
    cfg = Config(cfg_factory[model_name]())
    model = get_model_class(cfg.type).create_model(cfg, dtype=jnp.bfloat16)
    mesh = make_mesh(jax.devices()[:1], model=1)
    training = Config({
        "num_epoch": 1, "exp_dir": "/tmp/openasr_bench",
        "print_inteval": 10**9, "accumulate_grad_batch": 1,
        "init_lr": 1.0, "optimtype": "adam", "grad_max_norm": 50.0,
        "label_smooth": 0.1, "lambda_ctc": 1.0, "lambda_qua": 1.0,
        "lr_scheduler": {"type": "warmup_transformer", "warmup_step": 10000,
                         "d_model": bench.D_MODEL},
    })
    solver = get_solver_class(cfg.type)(model, training, [], [], mesh=mesh)
    raw_batch = (bench.make_wave_batch() if model_name == "online"
                 else bench.make_batch())
    batch = shard_batch(array_fields(raw_batch), mesh)
    rng = jax.random.PRNGKey(0)
    return solver, batch, rng


def hlo_report(model_name="flagship"):
    import jax
    solver, batch, rng = build_step(model_name)
    params, opt_state = solver.model.params, solver.opt_state
    fn = solver._train_step
    # unwrap to the jitted callable
    lowered = fn.lower(params, opt_state, batch, rng)
    compiled = lowered.compile()
    txt = compiled.as_text()
    hlo_path = f"/tmp/{model_name}_step.hlo"
    with open(hlo_path, "w") as f:
        f.write(txt)
    print(f"optimized HLO: {len(txt)} bytes -> {hlo_path}")

    # Walk HLO lines: find dot/convolution ops, record output dtype+shape and
    # operand dtypes from the full line.
    dots = collections.Counter()
    flops_by_dtype = collections.Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        if " dot(" not in line and " convolution(" not in line:
            continue
        out_dtype, out_shape = m.group(1), m.group(2)
        op = "dot" if " dot(" in line else "conv"
        # operand dtypes appear as dtype[shape] in the operand list
        operands = re.findall(r"(\w+)\[[\d,]*\]", line.split("(", 1)[1])
        key = (op, out_dtype, tuple(operands[:2]), out_shape)
        dots[key] += 1
    print("\n=== dot/conv inventory (op, out_dtype, operand_dtypes, out_shape) ===")
    f32_count = 0
    for key, n in sorted(dots.items()):
        op, od, ods, shape = key
        flag = ""
        if any(d == "f32" for d in ods):
            flag = "  <-- F32 OPERANDS"
            f32_count += n
        print(f"{n:3d}x {op} out={od}[{shape}] in={ods}{flag}")
    print(f"\nf32-operand dot/conv count: {f32_count}")

    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print(f"\ncost_analysis: flops={ca.get('flops', 0)/1e9:.1f}G "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.2f}GB")
    except Exception as e:
        print(f"cost_analysis unavailable: {e}")


def trace_report(n_steps=5, model_name="flagship"):
    import jax
    solver, batch, rng = build_step(model_name)
    state = {"p": solver.model.params, "o": solver.opt_state}

    def step(i):
        state["p"], state["o"], loss, _ = solver._train_step(
            state["p"], state["o"], batch, jax.random.fold_in(rng, i))
        return loss

    from openasr_tpu.utils.xprof import collect_device_events

    jax.block_until_ready(step(0))
    jax.block_until_ready(step(1))

    def run():
        out = None
        for i in range(n_steps):
            out = step(100 + i)
        jax.block_until_ready(out)

    events = collect_device_events(run, prefix="openasr_prof_")
    if events is None:
        print("tracing unavailable: no device-lane events captured")
        return
    # The device timeline carries three kinds of spans: the
    # jit_train_step umbrella, per-module umbrella spans whose names are
    # bare numbers (one per step, each covering the WHOLE step), and the
    # actual per-op spans.  The per-op spans sum to the step time —
    # measured: non-umbrella total / step total = 1.00 — so they are
    # single-counted; only the umbrellas must be dropped to avoid
    # double-counting.  Dedupe by (name, ts) besides, for lane mirrors.
    agg = collections.Counter()
    counts = collections.Counter()
    meta = {}
    seen = set()
    total = 0.0
    for e in events:
        name = e.get("name", "")
        key = (name, e.get("ts"))
        if key in seen:
            continue
        seen.add(key)
        if name.startswith("jit_train_step"):
            total += e["dur"]
            continue
        if re.fullmatch(r"\d+", name):  # per-module umbrella span
            continue
        agg[name] += e["dur"]
        counts[name] += 1
        args = e.get("args") or {}
        ln = args.get("long_name") or args.get("tf_op") or ""
        if ln and name not in meta:
            meta[name] = ln

    # Join with the HLO dump (if present): per-op byte traffic from the
    # instruction line, and matmul classification from the fusion's
    # called computation body (a fusion is compute-class if its body
    # holds a dot/convolution).
    hlo_defs = {}
    calls_of = {}
    comp_has_dot = collections.defaultdict(bool)
    hlo_path = f"/tmp/{model_name}_step.hlo"
    if os.path.exists(hlo_path):
        current_comp = None
        for line in open(hlo_path):
            mm = re.match(r"\s*(?:ROOT )?%([\w.\-]+) = ", line)
            if mm:
                hlo_defs[mm.group(1)] = line.strip()
                cm = re.search(r"calls=%?([\w.\-]+)", line)
                if cm:
                    calls_of[mm.group(1)] = cm.group(1)
            head = re.match(r"%?([\w.\-]+)\s*(?:\(.*\))?\s*->.*{\s*$", line)
            if head and " = " not in line:
                current_comp = head.group(1)
            elif line.rstrip() == "}":
                current_comp = None
            if current_comp and (" dot(" in line or " convolution(" in line):
                comp_has_dot[current_comp] = True
    DTSIZE = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
              "pred": 1, "f16": 2, "s64": 8, "u64": 8, "f64": 8}

    def shape_bytes(line):
        # dtype[shape] patterns appear ONLY in the op's output spec
        # (operands print as bare %names, layouts use parens) — so a
        # whole-line scan is exactly the output size
        total_b = 0
        for dt, shape in re.findall(r"(\w+)\[([\d,]*)\]", line):
            if dt not in DTSIZE:
                continue
            n = 1
            for d in shape.split(","):
                if d:
                    n *= int(d)
            total_b += n * DTSIZE[dt]
        return total_b

    def op_bytes(name):
        """HBM traffic estimate: output bytes + every operand's size
        (each operand %name resolved through its own def line).  Slight
        overcount when an operand is a forwarded tuple element; good
        enough for a roofline."""
        line = hlo_defs.get(name)
        if not line:
            return None
        total_b = shape_bytes(line)
        i = line.find("(%")
        if i >= 0:
            for a in re.findall(r"%([\w.\-]+)", line[i:]):
                if a != name and a in hlo_defs:
                    total_b += shape_bytes(hlo_defs[a])
        return total_b

    def op_class(name):
        """matmul / copy / loop / other — the roofline buckets."""
        base = name.split("%")[-1]
        if base.startswith(("while", "conditional")):
            return "loop"
        if base.startswith(("copy", "bitcast", "transpose", "reshape",
                            "all-reduce", "all-gather", "collective")):
            return "copy"
        line = hlo_defs.get(base, "")
        if " dot(" in line or " convolution(" in line:
            return "matmul"
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm and comp_has_dot.get(cm.group(1)):
            return "matmul"
        if "convolution" in base or base.startswith("dot"):
            return "matmul"
        if base.startswith("fusion") or True:
            return "other"

    cls_time = collections.Counter()
    cls_bytes = collections.Counter()
    for name, us in agg.items():
        c = op_class(name)
        cls_time[c] += us
        nb = op_bytes(name)
        if nb:
            cls_bytes[c] += nb * (counts[name] // max(n_steps, 1) or 1)

    # attribute device time to the PYTHON line that emitted each op
    # (HLO metadata carries source_file/source_line) — the "where is the
    # step going" table
    src_time = collections.Counter()
    for name, us in agg.items():
        line = hlo_defs.get(name.split("%")[-1], "")
        sm = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', line)
        if sm:
            path = sm.group(1)
            short = "/".join(path.split("/")[-2:])
            src_time[f"{short}:{sm.group(2)}"] += us
        else:
            src_time["(no source metadata)"] += us

    op_total_ms = sum(agg.values()) / 1e3 / n_steps
    step_ms = total / 1e3 / n_steps if total else op_total_ms
    print(f"\n=== device-lane per-op totals over {n_steps} steps "
          f"(jit_train_step total {step_ms:.2f} ms/step; op spans sum "
          f"to {op_total_ms:.2f} ms/step) ===")
    print("\n--- class totals (the roofline buckets) ---")
    for c in ("matmul", "other", "copy", "loop"):
        ms = cls_time[c] / 1e3 / n_steps
        gb = cls_bytes[c] / 1e9
        bw = gb / (ms / 1e3) if ms else 0.0
        print(f"{c:>7s}: {ms:7.3f} ms/step ({100*ms/max(op_total_ms,1e-9):4.1f}%)"
              f"  ~{gb:6.2f} GB touched  ~{bw:5.0f} GB/s")
    print("\n--- top source lines (device ms/step) ---")
    for src, us in src_time.most_common(25):
        print(f"{us/1e3/n_steps:8.3f} ms  {src}")
    shown = 0.0
    top = int(os.environ.get("PROFILE_TOP", "50"))
    print("\n--- top ops ---")
    for name, us in agg.most_common(top):
        ms = us / 1e3 / n_steps
        nb = op_bytes(name)
        if nb:
            bw = nb / 1e9 / (ms / 1e3)
            traffic = f"{nb/1e6:7.1f}MB {bw:6.0f}GB/s"
        else:
            traffic = " " * 17
        extra = meta.get(name, "")[:46]
        print(f"{ms:8.3f} ms x{counts[name]//n_steps:<3d} "
              f"[{op_class(name):>6s}] {traffic} "
              f"{name[:34]:<34s} {extra}")
        shown += us
    print(f"[shown {shown/1e3/n_steps:.2f} ms of {op_total_ms:.2f} ms op-total]")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", action="store_true")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--model", default="flagship",
                choices=["flagship", "cif", "wide", "online"])
    args = ap.parse_args()
    if args.fast:
        os.environ["BENCH_FAST"] = "1"
    if not (args.hlo or args.trace):
        args.hlo = args.trace = True
    if args.hlo:
        hlo_report(args.model)
    if args.trace:
        trace_report(model_name=args.model)
