"""Command-line interface, muscle-flag-compatible.

Mirrors the reference's single-dash command style (reference:
src/main.cpp:55-73 dispatch, src/myopts.h registry, src/usage.txt):
the command flag doubles as the input path, e.g.

    muscle-tpu -align seqs.fa -output aln.afa
    muscle-tpu -super5 big.fa -output aln.afa
    muscle-tpu -qscore test.afa -ref ref.afa
    muscle-tpu -disperse ensemble.efa
    muscle-tpu -maxcc ensemble.efa -output best.afa

Documented product commands (SURVEY §2.11) are implemented here;
developer/bench commands live behind the library API.
"""

from __future__ import annotations

import sys

from .sequence import MultiSequence


USAGE = """\
muscle-tpu — TPU-native multiple sequence alignment (MUSCLE v5 capabilities)

Commands:
  -align FILE        Align FASTA (MPC algorithm) -> -output
  -super5 FILE       Align large FASTA (Super5 pipeline) -> -output
  -super6 FILE       Align large FASTA (Super6, ML-distance clusters)
  -qscore FILE       Q/TC accuracy vs -ref reference alignment
  -disperse FILE     Ensemble dispersion of EFA
  -maxcc FILE        Pick max-confidence replicate from EFA -> -output
  -resample FILE     Bootstrap resampled MSAs from EFA -> -output
  -efa_explode FILE  Split EFA into FASTA files -> -prefix
  -fa2efa FILES      Concatenate FASTAs into EFA -> -output
  -addconfseq FILE   Append column-confidence row(s) to MSA -> -output
  -letterconf FILE   Per-letter confidence vs -ref -> -output

Options:
  -output FILE       Output path ('@' expands to replicate name)
  -ref FILE          Reference alignment (qscore/letterconf)
  -perm none|abc|acb|bca   Guide-tree permutation
  -perturb N         HMM perturbation seed
  -stratified        4 replicates x 4 perms ensemble
  -diversified       100 perturbed replicates ensemble
  -replicates N      Replicate count
  -consiters N       Consistency iterations (default 2)
  -refineiters N     Refinement iterations (default 100)
  -nt / -amino       Force alphabet (default: guess)
  -input_order       Output rows in input order (default: tree order)
  -guidetreein FILE  Use Newick guide tree
  -guidetreeout FILE Write guide tree and exit
  -hmmin/-hmmout FILE  Read/write HMM parameters
  -minsuper N        Auto-switch -align to Super5 at N seqs
  -threads N         (accepted for compatibility; device-parallel)
  -quiet / -log FILE
"""


class OptDict(dict):
    """Options dict that records which keys were consulted, mirroring
    the reference's optused_x tracking + CheckUsedOpts warning
    (reference: src/myutils.h:364-371, src/main.cpp:68)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.used: set[str] = set()

    def get(self, k, d=None):
        self.used.add(k)
        return super().get(k, d)

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        self.used.add(k)
        return super().__contains__(k)

    def unused(self) -> list[str]:
        # flags consumed by the harness itself, not the command
        harness = {"log", "quiet", "threads", "help", "version",
                   "fa2efa_files"}
        return sorted(k for k in self.keys()
                      if k not in self.used and k not in harness)


def parse_args(argv: list[str]) -> tuple[str | None, str | None, dict]:
    cmd = None
    arg1 = None
    opts: dict[str, object] = OptDict()
    flag_cmds = {
        "align", "super5", "super6", "super7", "uclustpd", "protdists",
        "qscore", "disperse", "maxcc", "testfb",
        "resample", "efa_explode", "fa2efa", "addconfseq", "letterconf",
        "efa_bestconf", "efa_bestcols", "colscore_efa", "qscore_efa",
        "trimtoref_efa", "eesort", "cmp_msa", "cmp_ref_msas", "upgma5",
        "bench", "bench_blosums", "sweep", "spatter",
        "consseq", "guide_tree", "efastats", "msastats",
        "eadistmx", "kmerdist", "muscle3",
        "m3ensemble", "m3select", "m3refine",
        "strip_gappy_cols", "strip_gappy_rows", "relabel", "trimtoref",
        "make_a2m", "squeeze_inserts", "core_blocks",
        "derep", "uclust", "transaln", "shrub", "swdistmx", "hmmdump",
        "perturbhmm", "masm_train", "masm_stats", "swmasm",
    }
    bool_opts = {"stratified", "diversified", "quiet", "nt", "amino",
                 "input_order", "tree_order", "verbose", "bysequence",
                 "version", "help", "mega", "reseek", "scaledist",
                 "eadist"}
    i = 0
    while i < len(argv):
        a = argv[i]
        if not a.startswith("-"):
            raise SystemExit(f"unexpected argument {a!r}")
        name = a.lstrip("-")
        if name in flag_cmds:
            if cmd is not None:
                raise SystemExit("only one command flag allowed")
            cmd = name
            if i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                arg1 = argv[i + 1]
                i += 1
            # fa2efa takes multiple input files
            if name == "fa2efa":
                files = [arg1] if arg1 else []
                while i + 1 < len(argv) and not argv[i + 1].startswith("-"):
                    files.append(argv[i + 1])
                    i += 1
                opts["fa2efa_files"] = files
        elif name in bool_opts:
            opts[name] = True
        else:
            if i + 1 >= len(argv):
                raise SystemExit(f"option -{name} requires a value")
            opts[name] = argv[i + 1]
            i += 1
        i += 1
    return cmd, arg1, opts


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    cmd, arg1, opts = parse_args(argv)

    if cmd is None or opts.get("help"):
        print(USAGE)
        return 0 if opts.get("help") or not argv else 1
    if opts.get("version"):
        from . import __version__
        print(f"muscle-tpu {__version__}")
        return 0

    from .utils import logging as mlog
    mlog.configure(log_path=opts.get("log"), quiet=bool(opts.get("quiet")))
    mlog.log("muscle-tpu %s", " ".join(argv))
    try:
        rc = _dispatch(cmd, arg1, opts)
    except Exception as e:
        mlog.progress("---Fatal error---\n%s", e)
        raise
    if isinstance(opts, OptDict):
        for name in opts.unused():
            mlog.progress("WARNING: option -%s was not used by -%s",
                          name, cmd)
    mlog.finish()
    return rc


def _dispatch(cmd: str, arg1: str, opts: dict) -> int:

    if cmd in ("align", "super5", "super6", "super7"):
        return _cmd_align(cmd, arg1, opts)
    if cmd == "testfb":
        return _cmd_testfb(arg1, opts)
    if cmd == "uclustpd":
        return _cmd_uclustpd(arg1, opts)
    if cmd == "protdists":
        return _cmd_protdists(arg1, opts)
    if cmd == "consseq":
        return _cmd_consseq(arg1, opts)
    if cmd == "efastats":
        return _cmd_efastats(arg1, opts)
    if cmd == "msastats":
        return _cmd_msastats(arg1, opts)
    if cmd == "eadistmx":
        return _cmd_eadistmx(arg1, opts)
    if cmd == "kmerdist":
        return _cmd_kmerdist(arg1, opts)
    if cmd == "muscle3":
        return _cmd_muscle3(arg1, opts)
    if cmd in ("m3ensemble", "m3select", "m3refine"):
        return _cmd_m3(cmd, arg1, opts)
    if cmd in ("strip_gappy_cols", "strip_gappy_rows", "relabel",
               "trimtoref", "make_a2m", "squeeze_inserts", "core_blocks"):
        return _cmd_msatool(cmd, arg1, opts)
    if cmd == "qscore":
        return _cmd_qscore(arg1, opts)
    if cmd == "disperse":
        return _cmd_disperse(arg1, opts)
    if cmd == "maxcc":
        return _cmd_maxcc(arg1, opts)
    if cmd == "resample":
        return _cmd_resample(arg1, opts)
    if cmd == "efa_explode":
        return _cmd_efa_explode(arg1, opts)
    if cmd == "fa2efa":
        return _cmd_fa2efa(opts)
    if cmd == "addconfseq":
        return _cmd_addconfseq(arg1, opts)
    if cmd == "letterconf":
        return _cmd_letterconf(arg1, opts)
    if cmd == "efa_bestconf":
        return _cmd_efa_bestconf(arg1, opts)
    if cmd == "efa_bestcols":
        return _cmd_efa_bestcols(arg1, opts)
    if cmd == "colscore_efa":
        return _cmd_colscore_efa(arg1, opts)
    if cmd == "qscore_efa":
        return _cmd_qscore_efa(arg1, opts)
    if cmd == "trimtoref_efa":
        return _cmd_trimtoref_efa(arg1, opts)
    if cmd == "eesort":
        return _cmd_eesort(arg1, opts)
    if cmd == "cmp_msa":
        return _cmd_cmp_msa(arg1, opts)
    if cmd == "cmp_ref_msas":
        return _cmd_cmp_ref_msas(arg1, opts)
    if cmd == "upgma5":
        return _cmd_upgma5(arg1, opts)
    if cmd in ("bench", "bench_blosums", "sweep", "spatter"):
        return _cmd_bench3(cmd, arg1, opts)
    if cmd == "derep":
        return _cmd_derep(arg1, opts)
    if cmd == "uclust":
        return _cmd_uclust(arg1, opts)
    if cmd == "transaln":
        return _cmd_transaln(arg1, opts)
    if cmd == "shrub":
        return _cmd_shrub(arg1, opts)
    if cmd == "swdistmx":
        return _cmd_swdistmx(arg1, opts)
    if cmd == "hmmdump":
        return _cmd_hmmdump(arg1, opts)
    if cmd == "perturbhmm":
        return _cmd_perturbhmm(arg1, opts)
    if cmd == "masm_train":
        return _cmd_masm_train(arg1, opts)
    if cmd == "masm_stats":
        return _cmd_masm_stats(arg1, opts)
    if cmd == "swmasm":
        return _cmd_swmasm(arg1, opts)
    raise SystemExit(f"unknown command -{cmd}")


def _nucleo_opt(opts) -> bool | None:
    if opts.get("nt"):
        return True
    if opts.get("amino"):
        return False
    return None


def _cmd_align(cmd: str, arg1: str, opts: dict) -> int:
    from .pipeline.ensemble import run_align_command
    out = opts.get("output")
    if not out:
        raise SystemExit("must set -output")
    if opts.get("savedir"):
        # dump every PProg join MSA (reference: src/pprog.cpp:354-363)
        from .pipeline import pprog
        pprog.SAVE_DIR = str(opts["savedir"])
    run_align_command(cmd, arg1, out, opts)
    return 0


def _cmd_consseq(arg1: str, opts: dict) -> int:
    from .pipeline.super4 import consensus_sequence
    from .alphabet import ALPHA_AMINO, ALPHA_NUCLEO, guess_is_nucleo
    from .utils.rng import MwcRng
    msa = MultiSequence.from_fasta(arg1)
    alpha = (ALPHA_NUCLEO if guess_is_nucleo(msa, MwcRng(1)) else ALPHA_AMINO)
    label = str(opts.get("label", "CONSENSUS"))
    out = opts.get("output")
    from .sequence import Sequence
    cons = MultiSequence([Sequence(label, consensus_sequence(msa, alpha))])
    if out:
        cons.write_fasta(str(out))
    else:
        print(cons.to_fasta_text(), end="")
    return 0


def _cmd_efastats(arg1: str, opts: dict) -> int:
    """Per-replicate column stats of an EFA (reference: src/efastats.cpp)."""
    from .pipeline.ensemble import Ensemble
    ens = Ensemble.from_efa(arg1)
    uniq = len({k for keys in ens._col_keys for k in keys})
    print(f"file={arg1} msas={ens.msa_count} unique_cols={uniq}")
    for i, (name, msa) in enumerate(zip(ens.names, ens.msas)):
        tc = ens.total_conf(i)
        print(f"{name}\tseqs={len(msa)}\tcols={msa.col_count()}"
              f"\ttotal_conf={tc:.1f}\tavg_conf={tc / msa.col_count():.4f}")
    return 0


def _cmd_msastats(arg1: str, opts: dict) -> int:
    """Basic MSA statistics (reference: src/msastats.cpp)."""
    import numpy as np
    msa = MultiSequence.from_fasta(arg1)
    mat = msa.to_matrix()
    gaps = (mat == ord("-")) | (mat == ord("."))
    gap_pct = 100.0 * gaps.mean()
    lens = [s.ungapped_length() for s in msa]
    print(f"file={arg1} seqs={len(msa)} cols={msa.col_count()} "
          f"gap_pct={gap_pct:.1f} min_len={min(lens)} max_len={max(lens)} "
          f"avg_len={sum(lens) / len(lens):.1f}")
    return 0


def _cmd_msatool(cmd: str, arg1: str, opts: dict) -> int:
    from . import msatools as mt
    msa = MultiSequence.from_fasta(arg1)
    gf = float(opts.get("max_gap_fract", 0.5))
    if cmd == "strip_gappy_cols":
        out = mt.strip_gappy_cols(msa, gf)
    elif cmd == "strip_gappy_rows":
        out = mt.strip_gappy_rows(msa, gf)
    elif cmd == "relabel":
        mapping = {}
        with open(str(opts["labels2"])) as f:
            for line in f:
                flds = line.rstrip("\n").split("\t")
                if len(flds) == 2:
                    mapping[flds[0]] = flds[1]
        out = mt.relabel(msa, mapping)
    elif cmd == "trimtoref":
        ref = MultiSequence.from_fasta(str(opts["ref"]))
        out = mt.trim_to_ref(msa, ref)
    elif cmd == "make_a2m":
        out = mt.make_a2m(msa, gf)
    elif cmd == "squeeze_inserts":
        out = mt.squeeze_inserts(msa, gf)
    elif cmd == "core_blocks":
        blocks = mt.core_blocks(
            msa, min_cols=int(opts.get("min_core_block_cols", 8)),
            min_seqs=int(opts.get("min_core_block_seqs", 8)))
        dest = opts.get("output")
        lines = [f"core_blocks\t{len(blocks)}"] + [
            f"{c0}\t{w}\t{r0}\t{nr}" for c0, w, r0, nr in blocks]
        text = "\n".join(lines) + "\n"
        if dest:
            open(str(dest), "w").write(text)
        else:
            print(text, end="")
        return 0
    else:
        raise SystemExit(cmd)
    dest = opts.get("output")
    if not dest:
        raise SystemExit("must set -output")
    out.write_fasta(str(dest))
    return 0


def _cmd_muscle3(arg1: str, opts: dict) -> int:
    """Classic profile aligner (reference: -muscle3 src/muscle3.cpp)."""
    from .pipeline.muscle3 import Muscle3
    out = opts.get("output")
    if not out:
        raise SystemExit("must set -output")
    seqs = MultiSequence.from_fasta(arg1)
    from .pipeline.muscle3 import M3Params
    params = M3Params(
        pctid=int(opts.get("blosumpct", 62)),
        param_group=int(opts.get("paramset", 0)),
        gap_open=(float(opts["gapopen"]) if opts.get("gapopen") else None),
        center=(float(opts["center"]) if opts.get("center") else None),
        kmer_dist=str(opts.get("kmerdist", "66")),
        linkage=str(opts.get("linkage", "min")),
        tree_iters=int(opts.get("treeiters", 1)))
    m3 = Muscle3(params=params)
    m3.run(seqs).write_fasta(str(out))
    return 0


def _cmd_bench3(cmd: str, arg1: str, opts: dict) -> int:
    """Benchmark sweeps over a directory of reference MSAs (reference:
    src/cmd_bench.cpp, src/sweep.cpp, src/spatter.cpp)."""
    from .pipeline import bench3
    if cmd == "bench":
        q, tc, n = bench3.run_bench(arg1, opts)
        print(f"AvgQ={q:.3f} AvgTC={tc:.3f} N={n}")
    elif cmd == "bench_blosums":
        bench3.run_bench_blosums(arg1, opts)
    elif cmd == "sweep":
        bench3.run_sweep(arg1, opts)
    else:
        bench3.run_spatter(arg1, opts)
    return 0


def _cmd_m3(cmd: str, arg1: str, opts: dict) -> int:
    """muscle3 perturbation ensembles (reference: src/cmd_m3ensemble.cpp,
    src/m3select.cpp, src/m3refine.cpp)."""
    from .pipeline.muscle3 import m3_ensemble, m3_refine, m3_select
    out = opts.get("output")
    if not out:
        raise SystemExit("must set -output")
    if cmd == "m3ensemble":
        seqs = MultiSequence.from_fasta(arg1, strip_gaps=True)
        m3_ensemble(seqs, str(out),
                    replicates=int(opts.get("replicates", 16)))
    elif cmd == "m3select":
        seqs = MultiSequence.from_fasta(arg1, strip_gaps=True)
        m3_select(seqs,
                  replicates=int(opts.get("replicates", 64))
                  ).write_fasta(str(out))
    else:
        msa = MultiSequence.from_fasta(arg1)
        if not msa.is_aligned():
            raise SystemExit("-m3refine input must be aligned")
        m3_refine(msa, iters=int(opts.get("iters", 32))
                  ).write_fasta(str(out))
    return 0


def _cmd_eadistmx(arg1: str, opts: dict) -> int:
    """All-pairs expected-accuracy matrix (reference: src/eadistmx.cpp)."""
    from .alphabet import ALPHA_AMINO, ALPHA_NUCLEO, guess_is_nucleo
    from .hmm.params import HMMParams
    from .pipeline.pairwise import PairAligner
    from .utils.rng import MwcRng
    out = opts.get("output")
    if not out:
        raise SystemExit("must set -output")
    seqs = MultiSequence.from_fasta(arg1, strip_gaps=True)
    nucleo = guess_is_nucleo(seqs, MwcRng(1))
    alpha = ALPHA_NUCLEO if nucleo else ALPHA_AMINO
    pack = HMMParams.from_defaults(nucleo=nucleo).to_scores()
    d = PairAligner(seqs, pack, alpha).ea_dist_matrix()
    labels = seqs.labels()
    with open(str(out), "w") as f:
        for i in range(len(labels)):
            for j in range(i + 1, len(labels)):
                f.write(f"{labels[i]}\t{labels[j]}\t{d[i, j]:.4f}\n")
    return 0


def _cmd_kmerdist(arg1: str, opts: dict) -> int:
    from .tree.kmerdist import kmer_dist_33, kmer_dist_66
    seqs = MultiSequence.from_fasta(arg1, strip_gaps=True)
    k = str(opts.get("k", "66"))
    d = kmer_dist_33(seqs) if k == "33" else kmer_dist_66(seqs)
    labels = seqs.labels()
    out = opts.get("output")
    lines = []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            lines.append(f"{labels[i]}\t{labels[j]}\t{d[i, j]:.4f}")
    text = "\n".join(lines) + "\n"
    if out:
        open(str(out), "w").write(text)
    else:
        print(text, end="")
    return 0


def _cmd_uclustpd(arg1: str, opts: dict) -> int:
    """Greedy ML-distance clustering to TSV (reference: cmd_uclustpd
    src/uclustpd.cpp:373-401; -tsvout centroid_index<TAB>label)."""
    from .pipeline.uclustpd import ProtDistCalc, UClustPD
    if "maxpd" not in opts:
        raise SystemExit("must set -maxpd")
    if opts.get("output"):
        raise SystemExit("use -tsvout not -output")
    max_pd = float(opts["maxpd"])
    seqs = MultiSequence.from_fasta(arg1, strip_gaps=True)
    calc = ProtDistCalc(seqs)
    # the reference promotes <= thread-count new seeds per iteration
    # (src/uclustpd.cpp:193), so -threads changes its clustering; honor
    # the same knob for output parity
    from .pipeline.uclustpd import DEFAULT_SEEDS_PER_ITER
    uc = UClustPD(calc, seeds_per_iter=int(
        opts.get("threads", DEFAULT_SEEDS_PER_ITER)))
    clusters = uc.run(list(range(len(seqs))), max_pd)
    out = opts.get("tsvout")
    lines = [f"{ci}\t{seqs[si].label}"
             for ci, members in enumerate(clusters) for si in members]
    text = "\n".join(lines) + "\n"
    if out:
        open(str(out), "w").write(text)
    else:
        print(text, end="")
    sizes = sorted((len(m) for m in clusters), reverse=True)
    print(f"{len(seqs)} seqs, {len(clusters)} clusters, "
          f"median {sizes[len(sizes) // 2]}, "
          f"singletons {sum(1 for s in sizes if s == 1)}")
    return 0


def _cmd_protdists(arg1: str, opts: dict) -> int:
    """All-pairs ML protein distances (reference: cmd_protdists
    src/protdists.cpp:16-86; label<TAB>label<TAB>dist)."""
    from .pipeline.uclustpd import ProtDistCalc
    seqs = MultiSequence.from_fasta(arg1, strip_gaps=True)
    calc = ProtDistCalc(seqs)
    n = len(seqs)
    pairs = [(i, j) for i in range(1, n) for j in range(i)]
    d = calc.dists(pairs)
    out = opts.get("output")
    lines = [f"{seqs[i].label}\t{seqs[j].label}\t{d[k]:.4g}"
             for k, (i, j) in enumerate(pairs)]
    text = "\n".join(lines) + "\n"
    if out:
        open(str(out), "w").write(text)
    else:
        print(text, end="")
    return 0


def _cmd_testfb(arg1: str, opts: dict) -> int:
    """Forward/Backward sanity check (reference: -testfb,
    src/testfb.cpp): for every consecutive sequence pair, the total
    log-probability folded from the Forward final states must equal
    the one folded from the Backward pass at the origin. Prints the
    max deviation; exits non-zero above 1e-3."""
    import numpy as np
    from .alphabet import ALPHA_AMINO, ALPHA_NUCLEO, guess_is_nucleo
    from .hmm.params import HMMParams
    from .ops import pairhmm
    from .utils.rng import MwcRng
    from .utils import logging as mlog

    seqs = MultiSequence.from_fasta(arg1)
    nucleo = (bool(opts.get("nt")) or
              (not opts.get("amino")
               and guess_is_nucleo(seqs, MwcRng(1))))
    alpha = ALPHA_NUCLEO if nucleo else ALPHA_AMINO
    pack = HMMParams.from_defaults(nucleo=nucleo).to_scores()
    from .pipeline.posteriors import encode_batch
    codes, lens = encode_batch(seqs, alpha)
    worst = 0.0
    import jax.numpy as jnp
    for i in range(len(seqs) - 1):
        x = jnp.asarray(codes[i][:int(lens[i])])
        y = jnp.asarray(codes[i + 1][:int(lens[i + 1])])
        tf = float(pairhmm.total_prob_fwd(x, y, pack))
        tb = float(pairhmm.total_prob_bwd(x, y, pack))
        worst = max(worst, abs(tf - tb) / max(1.0, abs(tf)))
        mlog.progress("testfb %s/%s: fwd %.6f bwd %.6f rel %.2e",
                      seqs[i].label, seqs[i + 1].label, tf, tb,
                      abs(tf - tb) / max(1.0, abs(tf)))
    mlog.progress("testfb max relative |fwd-bwd| = %.3e", worst)
    return 0 if worst < 1e-3 else 1


def _cmd_qscore(arg1: str, opts: dict) -> int:
    from .qscore import qscore
    ref_path = opts.get("ref")
    if not ref_path:
        raise SystemExit("must set -ref")
    test = MultiSequence.from_fasta(arg1)
    ref = MultiSequence.from_fasta(ref_path)
    q, tc = qscore(test, ref, by_sequence=bool(opts.get("bysequence")))
    print(f"{arg1} Q={q:.3g}, TC={tc:.3g}")
    return 0


def _cmd_disperse(arg1: str, opts: dict) -> int:
    from .pipeline.ensemble import Ensemble
    ens = Ensemble.from_efa(arg1)
    d_lp, d_cols = ens.dispersion()
    print(f"@disperse file={arg1} n={len(ens.msas)} D_LP={d_lp:.4f} D_Cols={d_cols:.4f}")
    return 0


def _cmd_maxcc(arg1: str, opts: dict) -> int:
    from .pipeline.ensemble import Ensemble
    ens = Ensemble.from_efa(arg1)
    best = ens.max_cc()
    out = opts.get("output")
    if out:
        ens.msas[best].write_fasta(out)
    print(f"maxcc replicate {ens.names[best]}")
    return 0


def _cmd_resample(arg1: str, opts: dict) -> int:
    from .pipeline.ensemble import Ensemble
    ens = Ensemble.from_efa(arg1)
    n = int(opts.get("replicates", 100))
    seed = int(opts.get("randseed", 1))
    out = opts.get("output")
    if not out:
        raise SystemExit("must set -output")
    ens.resample_to_file(out, n, seed)
    return 0


def _cmd_efa_explode(arg1: str, opts: dict) -> int:
    from .pipeline.ensemble import Ensemble
    ens = Ensemble.from_efa(arg1)
    prefix = opts.get("prefix", "")
    for name, msa in zip(ens.names, ens.msas):
        msa.write_fasta(f"{prefix}{name}.afa")
    return 0


def _cmd_fa2efa(opts: dict) -> int:
    files = opts.get("fa2efa_files", [])
    out = opts.get("output")
    if not out:
        raise SystemExit("must set -output")
    with open(out, "w") as f:
        for path in files:
            f.write(f"<{path}\n")
            f.write(MultiSequence.from_fasta(path).to_fasta_text())
    return 0


def _cmd_addconfseq(arg1: str, opts: dict) -> int:
    from .pipeline.ensemble import Ensemble
    ens = Ensemble.from_efa(arg1)
    out = opts.get("output")
    if not out:
        raise SystemExit("must set -output")
    ens.write_with_conf_seq(out)
    return 0


def _cmd_letterconf(arg1: str, opts: dict) -> int:
    """Per-letter confidence vs a reference alignment (reference:
    cmd_letterconf src/letterconf.cpp:47-92)."""
    from .pipeline.ensemble import Ensemble
    ens = Ensemble.from_efa(arg1)
    ref_path = opts.get("ref")
    if not ref_path:
        raise SystemExit("must set -ref")
    ref = MultiSequence.from_fasta(str(ref_path))
    stats = ens.letter_conf(ref, opts.get("output"))
    if opts.get("html"):
        ens.letter_conf_html(str(opts["html"]), ref)
    if opts.get("jalview"):
        ens.letter_conf_jalview(str(opts["jalview"]), ref)
    print(f"letterconf Q={stats['Q']:.3g} TC={stats['TC']:.3g} "
          f"mean_conf={stats['mean_conf']:.3g}")
    return 0


def _cmd_efa_bestconf(arg1: str, opts: dict) -> int:
    """Per-replicate confidence table; writes the best-median replicate
    (reference: cmd_efa_bestconf src/efabestconf.cpp:4-57)."""
    from .pipeline.ensemble import Ensemble
    ens = Ensemble.from_efa(arg1)
    stats = ens.best_conf_stats()
    print("  MSA     Cols     N1   N1f  TotConf  MedConf  Name")
    for s in stats:
        print(f"{s['index'] + 1:5d}  {s['cols']:7d}  {s['n1']:5d}  "
              f"{s['n1f']:4.2f}  {s['total_conf']:7.3f}  "
              f"{s['median_conf']:7.4f}  {s['name']}")
    best_tot = max(stats, key=lambda s: s["total_conf"])
    best_med = max(stats, key=lambda s: s["median_conf"])
    print(f"Best MSA, total  {best_tot['index'] + 1} ({best_tot['name']})")
    print(f"Best MSA, median {best_med['index'] + 1} ({best_med['name']})")
    out = opts.get("output")
    if out:
        ens.msas[best_med["index"]].write_fasta(str(out))
    return 0


def _cmd_efa_bestcols(arg1: str, opts: dict) -> int:
    """MSA of the highest-confidence unique columns
    (reference: cmd_efa_bestcols src/efabestcols.cpp:5-64)."""
    from .pipeline.ensemble import Ensemble
    out = opts.get("output")
    if not out:
        raise SystemExit("must set -output")
    ens = Ensemble.from_efa(arg1)
    maxcols = opts.get("maxcols")
    msa = ens.best_cols_msa(
        min_conf=float(opts.get("minconf", 1.0)),
        max_gap_fract=float(opts.get("max_gap_fract", 0.5)),
        max_cols=int(maxcols) if maxcols else None)
    msa.write_fasta(str(out))
    return 0


def _cmd_colscore_efa(arg1: str, opts: dict) -> int:
    """Mean TC + confidence-bin calibration vs a reference alignment
    (reference: cmd_colscore_efa src/colscoreefa.cpp:18-102)."""
    from .pipeline.ensemble import Ensemble
    ref_path = opts.get("ref")
    if not ref_path:
        raise SystemExit("must set -ref")
    ens = Ensemble.from_efa(arg1)
    ref = MultiSequence.from_fasta(str(ref_path))
    res = ens.colscore(ref, float(opts.get("max_gap_fract", 0.5)))
    lines = [f"meantc\t{res['mean_tc']:.4f}"]
    for b in res["bins"]:
        lines.append(f"bin\t{b['bin']}\t{b['count']}\t{b['correct']}"
                     f"\t{b['p']:.4f}")
    text = "\n".join(lines) + "\n"
    out = opts.get("output")
    if out:
        open(str(out), "w").write(text)
    print(text, end="")
    return 0


def _cmd_qscore_efa(arg1: str, opts: dict) -> int:
    """Q/TC of every replicate vs a reference alignment
    (reference: cmd_qscore_efa src/qscoreefa.cpp:5-33)."""
    from .pipeline.ensemble import Ensemble
    from .qscore import qscore
    ref_path = opts.get("ref")
    if not ref_path:
        raise SystemExit("must set -ref")
    ens = Ensemble.from_efa(arg1)
    ref = MultiSequence.from_fasta(str(ref_path))
    import os
    ref_name = os.path.splitext(os.path.basename(str(ref_path)))[0]
    for name, msa in zip(ens.names, ens.msas):
        q, tc = qscore(msa, ref)
        print(f"{ref_name} {name} Q={q:.4f} TC={tc:.4f}")
    return 0


def _cmd_trimtoref_efa(arg1: str, opts: dict) -> int:
    """Trim every replicate to the reference's columns, EFA out
    (reference: cmd_trimtoref_efa src/trimtorefefa.cpp:8-33)."""
    from . import msatools as mt
    from .pipeline.ensemble import Ensemble
    ref_path = opts.get("ref")
    out = opts.get("output")
    if not ref_path or not out:
        raise SystemExit("must set -ref and -output")
    ens = Ensemble.from_efa(arg1)
    ref = MultiSequence.from_fasta(str(ref_path))
    with open(str(out), "w") as f:
        for name, msa in zip(ens.names, ens.msas):
            f.write(f"<{name}\n")
            f.write(mt.trim_to_ref(msa, ref).to_fasta_text())
    return 0


def _cmd_eesort(arg1: str, opts: dict) -> int:
    """Sort DB sequences by pair-HMM expected accuracy to the first
    query sequence (reference: cmd_eesort src/eesort.cpp:5-80 — EAs are
    computed vs query 0; batched on device here)."""
    from .alphabet import ALPHA_AMINO, ALPHA_NUCLEO, guess_is_nucleo
    from .hmm.params import HMMParams
    from .pipeline.pairwise import PairAligner
    from .utils.rng import MwcRng
    import numpy as np
    db_path = opts.get("db")
    out = opts.get("output")
    if not db_path or not out:
        raise SystemExit("must set -db and -output")
    query = MultiSequence.from_fasta(arg1, strip_gaps=True)
    db = MultiSequence.from_fasta(str(db_path), strip_gaps=True)
    nucleo = guess_is_nucleo(db, MwcRng(1))
    alpha = ALPHA_NUCLEO if nucleo else ALPHA_AMINO
    pack = HMMParams.from_defaults(nucleo=nucleo).to_scores()
    combined = MultiSequence([query[0]] + list(db))
    aligner = PairAligner(combined, pack, alpha)
    eas = aligner.ea([(0, 1 + i) for i in range(len(db))])
    order = np.argsort(-np.asarray(eas), kind="stable")
    tsv = opts.get("tsvout")
    ftsv = open(str(tsv), "w") if tsv else None
    with open(str(out), "w") as f:
        for k in order:
            if ftsv:
                ftsv.write(f"{eas[k]:.3g}\t{db[int(k)].label}\n")
            MultiSequence([db[int(k)]])._write(f)
    if ftsv:
        ftsv.close()
    return 0


def _cmd_cmp_msa(arg1: str, opts: dict) -> int:
    """HTML comparison of a test MSA vs a reference: letters colored by
    their reference column, golden-ratio HSV palette
    (reference: cmd_cmp_msa src/cmd_cmp_msa.cpp:130-246)."""
    from .utils.rng import MwcRng
    ref_path = opts.get("ref")
    out = opts.get("output")
    if not ref_path or not out:
        raise SystemExit("must set -ref and -output")
    test = MultiSequence.from_fasta(arg1)
    ref = MultiSequence.from_fasta(str(ref_path))

    def hsv_to_rgb(h, s, v):
        hi = int(h * 6)
        f = h * 6 - hi
        p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
        r, g, b = [(v, t, p), (q, v, p), (p, v, t),
                   (p, q, v), (t, p, v), (v, p, q)][hi % 6]
        return int(r * 255), int(g * 255), int(b * 255)

    rng = MwcRng(1)
    hue = (rng.randu32() % 1000) / 1000.0
    colors: list[str] = []

    def color_for(ref_col: int) -> str:
        nonlocal hue
        while ref_col >= len(colors):
            i = len(colors)
            if i % 4 == 0:
                hue = (hue + 0.618033988749895) % 1.0
            r, g, b = hsv_to_rgb(hue, 0.5, 0.95)
            factor = (4 - i % 4) / 4.0
            colors.append("#%02x%02x%02x" % (int(r * factor),
                                             int(g * factor),
                                             int(b * factor)))
        return colors[ref_col]

    ref_rows = {s.label: s for s in ref}
    html = ["<html>", "<body>", '<span style="font-size:16px"><pre>']
    cols = test.col_count()
    ROWLEN = 100
    # per test row: test column -> ref column (or None)
    maps = {}
    for s in test:
        r = ref_rows.get(s.label)
        if r is None:
            continue
        p2c = r.pos_to_col()
        m = [None] * cols
        pos = 0
        for c, ch in enumerate(s.text()):
            if ch not in "-.":
                if pos < len(p2c):
                    m[c] = int(p2c[pos])
                pos += 1
        maps[s.label] = m
    for lo in range(0, cols, ROWLEN):
        hi = min(lo + ROWLEN, cols)
        for s in test:
            if s.label not in maps:
                continue
            row = ["   "]
            m = maps[s.label]
            for c in range(lo, hi):
                ch = s.text()[c]
                if m[c] is None:
                    row.append(f'<span style="color:gray">{ch}</span>')
                else:
                    row.append(
                        f'<span style="color:white;background-color:'
                        f'{color_for(m[c])}">{ch}</span>')
            row.append(" " * (lo + ROWLEN - hi))
            row.append(f'  <span style="color:black">{s.label}   </span>')
            html.append("".join(row))
        html.append("\n")
    html.extend(["</pre></span>", "</body>", "</html>"])
    open(str(out), "w").write("\n".join(html) + "\n")
    return 0


def _cmd_upgma5(arg1: str, opts: dict) -> int:
    """UPGMA tree from a distance-matrix file (reference: cmd_upgma5
    src/upgma5.cpp:565-610; -reseek reads reseek's format + rescales,
    plain format is label<TAB>label<TAB>dist with -scaledist/-eadist
    transforms; default linkage avg)."""
    import numpy as np
    from .tree.upgma import (fix_ea_distmx, read_distmx_reseek,
                             scale_dist_mx, upgma5)
    out = opts.get("output")
    if not out:
        raise SystemExit("must set -output")
    if opts.get("reseek"):
        labels, d = read_distmx_reseek(arg1)
        d = scale_dist_mx(d)
    else:
        labels = []
        idx: dict[str, int] = {}
        trips = []
        for line in open(arg1):
            f = line.rstrip("\n").split("\t")
            if len(f) != 3:
                continue
            for lb in f[:2]:
                if lb not in idx:
                    idx[lb] = len(labels)
                    labels.append(lb)
            trips.append((f[0], f[1], float(f[2])))
        d = np.zeros((len(labels), len(labels)), dtype=np.float64)
        for a, b, v in trips:
            d[idx[a], idx[b]] = d[idx[b], idx[a]] = v
        if opts.get("scaledist"):
            d = scale_dist_mx(d)
        elif opts.get("eadist"):
            d = fix_ea_distmx(d)
    tree = upgma5(labels, d, str(opts.get("linkage", "avg")))
    tree.to_file(str(out))
    return 0


def _cmd_cmp_ref_msas(arg1: str, opts: dict) -> int:
    """Column-agreement diagnostic between two alignments of the same
    sequences: per-matched-column Q and the summary line (compact
    equivalent of cmd_cmp_ref_msas src/cmp_ref_msas.cpp:22-171, which
    is a log-only dev report)."""
    import numpy as np
    ref_path = opts.get("ref")
    if not ref_path:
        raise SystemExit("must set -ref")
    test = MultiSequence.from_fasta(arg1)
    ref = MultiSequence.from_fasta(str(ref_path))
    common = [s.label for s in test if s.label in
              {r.label for r in ref}]
    if len(common) < 2:
        raise SystemExit("fewer than 2 shared labels")
    t_rows = {s.label: s for s in test}
    r_rows = {s.label: s for s in ref}

    def col_keys(rows):
        mat = np.stack([rows[lb].bytes_view() for lb in common])
        nongap = (mat != ord("-")) & (mat != ord("."))
        pos = np.cumsum(nongap, axis=1) * nongap
        return [tuple(pos[:, c]) for c in range(mat.shape[1])], nongap

    t_keys, t_ng = col_keys(t_rows)
    r_keys, r_ng = col_keys(r_rows)
    # per ref col: the test col holding the plurality of its letters
    # (letter = (seq, position)); col Q = matching letters / letters
    letter_to_tcol = {}
    for c, key in enumerate(t_keys):
        for i, p in enumerate(key):
            if p:
                letter_to_tcol[(i, p)] = c
    qs = []
    import sys as _sys
    name = str(arg1)
    for c, key in enumerate(r_keys):
        letters = [(i, p) for i, p in enumerate(key) if p]
        if len(letters) < 2:
            continue
        votes: dict[int, int] = {}
        for lt in letters:
            tc = letter_to_tcol.get(lt)
            if tc is not None:
                votes[tc] = votes.get(tc, 0) + 1
        best = max(votes.values()) if votes else 0
        qs.append(best / len(letters))
    q = float(np.mean(qs)) if qs else 0.0
    print(f"@CMP_REF_MSAs test={arg1} ref={ref_path} name={name} "
          f"cols={len(qs)} Q={q:.4f}")
    return 0


# ---------------------------------------------------------------------------
# Standalone stage commands (reference: src/cmds.h dev surface)
# ---------------------------------------------------------------------------

def _cmd_derep(arg1: str, opts: dict) -> int:
    """Write the unique (dereplicated) sequences (reference:
    cmd_derep, src/derep.cpp:226-241)."""
    from .pipeline.derep import Derep
    from .sequence import MultiSequence
    seqs = MultiSequence.from_fasta(arg1)
    d = Derep()
    d.run(seqs)
    d.unique_seqs(seqs).write_fasta(opts["output"])
    return 0


def _cmd_uclust(arg1: str, opts: dict) -> int:
    """Greedy EA-threshold clustering; writes centroid sequences
    (reference: cmd_uclust, src/uclust.cpp:183-206)."""
    from .alphabet import ALPHA_AMINO, ALPHA_NUCLEO, guess_is_nucleo
    from .hmm.params import HMMParams
    from .pipeline.pairwise import PairAligner
    from .pipeline.uclust import UClust
    from .sequence import MultiSequence
    from .utils.rng import MwcRng
    seqs = MultiSequence.from_fasta(arg1)
    min_ea = float(opts.get("minea", 0.9))
    nucleo = guess_is_nucleo(seqs, MwcRng(1))
    alpha = ALPHA_NUCLEO if nucleo else ALPHA_AMINO
    pack = HMMParams.from_defaults(nucleo=nucleo).to_scores()
    aligner = PairAligner(list(seqs), pack, alpha)
    uc = UClust(aligner, alpha)
    centroid_idx, _assign, _paths = uc.run(seqs, min_ea)
    MultiSequence([seqs[i] for i in centroid_idx]) \
        .write_fasta(opts["output"])
    return 0


def _cmd_transaln(arg1: str, opts: dict) -> int:
    """Transitively align fresh sequences onto an existing MSA: each
    input is pair-aligned (pair-HMM + MEA) to ungapped reference row
    i % ref_count and merged through the transitive path machinery
    (reference: cmd_transaln, src/transaln.cpp:752-810)."""
    from .alphabet import ALPHA_AMINO, ALPHA_NUCLEO, guess_is_nucleo
    from .hmm.params import HMMParams
    from .pipeline.pairwise import PairAligner
    from .pipeline.transaln import make_extended_msa
    from .sequence import MultiSequence, Sequence
    from .utils.rng import MwcRng
    fresh = MultiSequence.from_fasta(arg1)
    ref_msa = MultiSequence.from_fasta(opts["ref"])
    nref = len(ref_msa)
    ungapped = [Sequence(s.label,
                         s.bytes_view()[s.bytes_view() != ord("-")])
                for s in ref_msa]
    nucleo = guess_is_nucleo(fresh, MwcRng(1))
    alpha = ALPHA_NUCLEO if nucleo else ALPHA_AMINO
    pack = HMMParams.from_defaults(nucleo=nucleo).to_scores()
    aligner = PairAligner(list(fresh) + ungapped, pack, alpha)
    idx = [i % nref for i in range(len(fresh))]
    results = aligner.align_pairs(
        [(k, len(fresh) + idx[k]) for k in range(len(fresh))])
    paths = [p for _ea, p in results]
    out = make_extended_msa(ref_msa, list(fresh), idx, paths)
    out.write_fasta(opts["output"])
    return 0


def _cmd_shrub(arg1: str, opts: dict) -> int:
    """Report the shrub decomposition of a guide tree: non-overlapping
    subtrees of <= n leaves covering all leaves (reference: cmd_shrub,
    src/shrub.cpp:39-92)."""
    from .pipeline.super7 import get_shrubs
    from .tree.tree import Tree
    tree = Tree.from_file(arg1)
    n = int(opts.get("n", 32))
    lcas = get_shrubs(tree, n)
    total = 0
    for i, lca in enumerate(lcas):
        leaves = tree.subtree_leaves(lca)
        total += len(leaves)
        print(f"shrub {i}: node {lca}, {len(leaves)} leaves: "
              + ",".join(leaves))
    assert total == len(tree.leaf_labels())
    print(f"{len(lcas)} shrubs, {total} leaves, max size {n}")
    return 0


def _cmd_swdistmx(arg1: str, opts: dict) -> int:
    """SW-BLOSUM62 guide tree (device-batched all-pairs local
    alignment similarities -> rescale -> UPGMA avg); writes Newick
    (reference: cmd_swdistmx, src/swdistmx.cpp:129-137)."""
    from .alphabet import ALPHA_AMINO
    from .ops.sw import sw_dist_matrix
    from .sequence import MultiSequence
    from .tree.upgma import LINKAGE_AVG, scale_dist_mx, upgma5
    seqs = MultiSequence.from_fasta(arg1)
    sim = sw_dist_matrix(list(seqs), ALPHA_AMINO)
    tree = upgma5(seqs.labels(), scale_dist_mx(sim), LINKAGE_AVG)
    with open(opts["guidetreeout"], "w") as f:
        f.write(tree.to_newick() + "\n")
    return 0


def _cmd_hmmdump(arg1: str, opts: dict) -> int:
    """Dump the HMM parameter set to a directory: defaults (hmm.tsv),
    a serialization round trip (hmm2/hmm3.tsv, byte-identical), and
    the single-affine collapse (sa.hmm) (reference: cmd_hmmdump,
    src/hmmdump.cpp:257-284)."""
    import os as _os
    from .hmm.params import HMMParams
    outdir = arg1
    _os.makedirs(outdir, exist_ok=True)
    hp = HMMParams.from_defaults(nucleo=bool(opts.get("nt")))
    hp.to_file(_os.path.join(outdir, "hmm.tsv"))
    hp.to_file(_os.path.join(outdir, "hmm2.tsv"))
    hp2 = HMMParams.from_file(_os.path.join(outdir, "hmm2.tsv"))
    hp2.to_file(_os.path.join(outdir, "hmm3.tsv"))
    sa = _single_affine(hp2)
    sa.to_file(_os.path.join(outdir, "sa.hmm"))
    return 0


def _single_affine(hp):
    """Average the short/long gap tracks into one affine class
    (reference: HMMParams::ToSingleAffineProbs,
    src/hmmparams.cpp:52-77)."""
    from .hmm.params import HMMParams, TRANS_NAMES
    t = {n: float(v) for n, v in zip(TRANS_NAMES, hp.trans)}
    si = (t["START_IS"] + t["START_IL"]) / 2
    mi = (t["M_IS"] + t["M_IL"]) / 2
    im = (t["IS_M"] + t["IL_M"]) / 2
    ii = (t["IS_IS"] + t["IL_IL"]) / 2
    t.update(START_IS=si, START_IL=si, M_IS=mi, M_IL=mi,
             IS_M=im, IL_M=im, IS_IS=ii, IL_IL=ii)
    import numpy as np
    trans = np.array([t[n] for n in TRANS_NAMES], dtype=np.float32)
    return HMMParams(hp.alpha, trans, hp.emits, hp.var)


def _cmd_perturbhmm(arg1: str, opts: dict) -> int:
    """Perturbation-stream diagnostic: for each seed, perturb the
    default parameters and report mean |delta| of transitions and
    emissions vs the defaults (reference: cmd_perturbhmm,
    src/perturbhmm.cpp:68-99)."""
    import numpy as np
    from .hmm.params import HMMParams
    from .utils import logging as mlog
    iters = int(arg1)
    nucleo = bool(opts.get("nt"))
    base = HMMParams.from_defaults(nucleo=nucleo)
    for it in range(iters):
        hp = HMMParams.from_defaults(nucleo=nucleo)
        hp.perturb(it)
        dt = float(np.abs(base.trans - hp.trans).mean())
        de = float(np.abs(base.emits - hp.emits).mean())
        mlog.progress("Iter %u, trans %8.6f, emit %8.6f", it, dt, de)
    return 0


def _cmd_masm_train(arg1: str, opts: dict) -> int:
    """Train a MASM (masked alignment scoring model) from an aligned
    family + its mega feature profiles (reference: cmd_masm_train,
    src/masm_train.cpp:18-37)."""
    import os as _os
    from .io.mega import parse_mega
    from .pipeline.masm import MASM
    from .sequence import MultiSequence
    aln = MultiSequence.from_fasta(arg1)
    mega = parse_mega(opts["input"])
    label = opts.get("label") or _os.path.basename(arg1)
    MASM.from_msa(aln, mega, label).to_file(opts["output"])
    return 0


def _cmd_masm_stats(arg1: str, opts: dict) -> int:
    """Print MASM dimensions (reference: cmd_masm_stats,
    src/masm_train.cpp:4-16)."""
    from .pipeline.masm import MASM
    m = MASM.from_file(arg1)
    feats = " ".join(f"{n}/{a}" for n, a in
                     zip(m.feature_names, m.alpha_sizes))
    print(f"{m.seq_count:10d}  Sequences")
    print(f"{m.col_count:10d}  Columns")
    print(f"{len(m.feature_names):10d}  Features  {feats}")
    return 0


def _cmd_swmasm(arg1: str, opts: dict) -> int:
    """Local-align every profile of a mega file against a MASM; write
    label pairs + SW scores as TSV (reference: cmd_swmasm,
    src/swmasm.cpp:27-65)."""
    from .io.mega import parse_mega
    from .pipeline.masm import MASM
    m = MASM.from_file(arg1)
    mega = parse_mega(opts["query"])
    out_path = opts.get("output")
    lines = []
    for lb, prof in zip(mega.labels, mega.profiles):
        score, _path, _loi, _loj = m.sw_vs_profile(prof)
        lines.append(f"{m.label}\t{lb}\t{score:.3g}")
    text = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    else:
        print(text, end="")
    return 0


if __name__ == "__main__":
    sys.exit(main())
