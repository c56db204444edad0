"""Full-scale rdrp -super5 with process-level retries.

The tunneled chip's remote_compile RPC intermittently drops its
response mid-compile on long runs; every attempt's compiles land in
the persistent cache, so a fresh process replays completed work in
minutes and progresses further. See docs/PARITY.md (rdrp campaign).
"""
import os, subprocess, sys, time

WORKER = """
import os, sys, time
sys.path.insert(0, "/root/repo")
from muscle_tpu.cli import main as cli_main
cli_main(["-super5", "/root/reference/test_data/rdrp/rdrp.fa",
          "-output", "/tmp/rdrp_out/rdrp_seqs.afa",
          "-log", "/tmp/rdrp_out/super5_rdrp.log"])
"""

os.makedirs("/tmp/rdrp_out", exist_ok=True)
t0 = time.time()
for attempt in range(4):
    r = subprocess.run([sys.executable, "-c", WORKER])
    if r.returncode == 0:
        break
    print(f"attempt {attempt}: rc={r.returncode}; retrying (warm cache)",
          flush=True)
else:
    sys.exit("super5 rdrp failed after retries")
dt = time.time() - t0
print(f"super5 rdrp.fa: {dt:.0f}s (incl. {attempt} retries)", flush=True)

sys.path.insert(0, "/root/repo")
from muscle_tpu.sequence import MultiSequence
msa = MultiSequence.from_fasta("/tmp/rdrp_out/rdrp_seqs.afa")
inp = MultiSequence.from_fasta("/root/reference/test_data/rdrp/rdrp.fa")
assert sorted(s.label for s in msa) == sorted(s.label for s in inp)
assert msa.is_aligned()
deg = {s.label: s.text().replace("-", "") for s in msa}
bad = sum(1 for s in inp if deg[s.label] != s.text())
print(f"{len(msa)} seqs x {msa.col_count()} cols; residue-intact rows: "
      f"{len(msa)-bad}/{len(msa)}", flush=True)
