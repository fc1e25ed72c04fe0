#!/usr/bin/env python
"""Multi-host proof harness: the sharded train step across 2 PROCESSES.

No pod is attached, so the DCN leg of the north star ("1 host -> >=2 hosts",
BASELINE.md scaling row) is proven the standard JAX way: two OS processes,
each with 4 virtual CPU devices (``--xla_force_host_platform_device_count``),
joined by ``jax.distributed.initialize`` over a localhost coordinator with
gloo CPU collectives — the same code path a 2-host TPU pod slice takes, with
DCN swapped for loopback.  The harness then runs the IDENTICAL dryrun in one
8-device process and asserts the losses agree (the computation graph is the
same; only the process boundary moves).

Usage (parent — spawns everything):
    python scripts/multihost_dryrun.py [--n 8000] [--size 256] [--out f.json]

Child mode is internal (--process-id).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def run_child(args) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gstpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if args.num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from gstpu.parallel.multihost import init_distributed

    init_distributed(args.coordinator, args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import __graft_entry__ as g

    out = g.dryrun_multichip(8, n_gaussians=args.n, width=args.size,
                             height=args.size,
                             pallas_interpret_step=args.pallas)
    out["process_id"] = args.process_id
    out["num_processes"] = args.num_processes
    out["process_count"] = jax.process_count()
    print("RESULT " + json.dumps(out), flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(np_, local_devices, port, args, pid):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # force CPU (axon sitecustomize)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{local_devices}")
    cmd = [sys.executable, __file__, "--process-id", str(pid),
           "--num-processes", str(np_), "--coordinator",
           f"localhost:{port}", "--n", str(args.n), "--size",
           str(args.size)]
    if args.pallas:
        cmd.append("--pallas")
    return subprocess.Popen(cmd, env=env, cwd=ROOT,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _collect(proc, timeout):
    out, _ = proc.communicate(timeout=timeout)
    results = [json.loads(line[len("RESULT "):])
               for line in out.splitlines() if line.startswith("RESULT ")]
    if proc.returncode != 0 or not results:
        raise RuntimeError(f"child rc={proc.returncode}:\n{out[-4000:]}")
    return results[0], out


def run_parent(args) -> None:
    port = _free_port()
    # 2 processes x 4 devices
    procs = [_spawn(2, 4, port, args, pid) for pid in range(2)]
    multi = []
    for p in procs:
        r, out = _collect(p, args.timeout)
        multi.append(r)
        sys.stdout.write(out)
    # 1 process x 8 devices (the already-proven single-process path)
    ref_proc = _spawn(1, 8, _free_port(), args, 0)
    ref, out = _collect(ref_proc, args.timeout)
    sys.stdout.write(out)

    checks = {}
    for key in ("loss", "loss2", "loss_pallas"):
        vals = [r[key] for r in multi] + [ref[key]]
        if vals[0] is None:
            continue
        spread = max(vals) - min(vals)
        rel = spread / max(abs(ref[key]), 1e-12)
        checks[key] = {"two_process": [r[key] for r in multi],
                       "single_process": ref[key], "rel_spread": rel}
        assert rel < 1e-5, (key, vals)
    result = {"ok": True, "n": args.n, "size": args.size, "checks": checks}
    print(json.dumps(result))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--n", type=int, default=8_000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--pallas", action="store_true",
                    help="include the interpret-mode Pallas step (slow)")
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.process_id is not None:
        run_child(args)
    else:
        run_parent(args)


if __name__ == "__main__":
    main()
