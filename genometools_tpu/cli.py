"""gt-style command line driver.

Capability equivalent of the reference toolbox dispatch
(ref: src/gt.c:21, src/gtr.c:428, tool registry src/gtt.c:186-265).
Tools are argparse subcommands; each maps to an engine module. Invoke as
`python -m genometools_tpu <tool> ...`.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _force_platform(args):
    """Select device platform before first JAX touch."""
    if getattr(args, "cpu", False):
        import jax
        jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# suffixerator
# ---------------------------------------------------------------------------

def cmd_suffixerator(args):
    _force_platform(args)
    from .core.encseq import READMODES, Encseq
    from .index.esa import build_esa, write_esa

    enc = Encseq.from_files(args.db)
    if args.mirrored:
        enc = enc.mirror()
    rm = READMODES[args.dir]
    esa = build_esa(enc, rm, with_lcp=args.lcp,
                    prefixlength=args.pl or None, with_bck=args.bck)
    indexname = args.indexname or args.db[0]
    if args.tis:
        enc.save(indexname)
    write_esa(esa, indexname, suf=args.suf, lcp=args.lcp, bwt=args.bwt,
              bck=args.bck)
    if args.showtime:
        print(f"# indexed {enc.total_length} symbols, "
              f"{enc.num_sequences} sequences", file=sys.stderr)
    return 0


def _add_suffixerator(sub):
    p = sub.add_parser("suffixerator", help="compute enhanced suffix array")
    p.add_argument("-db", nargs="+", required=True, help="input sequence files")
    p.add_argument("-indexname", default=None)
    p.add_argument("-suf", action="store_true", help="output suffix table")
    p.add_argument("-lcp", action="store_true", help="output lcp table")
    p.add_argument("-tis", action="store_true", help="output encoded sequence")
    p.add_argument("-bwt", action="store_true", help="output BWT table")
    p.add_argument("-bck", action="store_true", help="output bucket table")
    p.add_argument("-pl", type=int, nargs="?", const=0, default=0,
                   help="prefix length (0 = auto)")
    p.add_argument("-dna", action="store_true")
    p.add_argument("-protein", action="store_true")
    p.add_argument("-mirrored", action="store_true")
    p.add_argument("-ssp", action="store_true")
    p.add_argument("-des", action="store_true")
    p.add_argument("-dir", default="fwd", choices=["fwd", "rev", "cpl", "rcl"])
    p.add_argument("-showtime", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.set_defaults(func=cmd_suffixerator)


# ---------------------------------------------------------------------------
# encseq
# ---------------------------------------------------------------------------

def cmd_encseq(args):
    from .core.encseq import Encseq
    if args.sub == "encode":
        enc = Encseq.from_files(args.files)
        enc.save(args.indexname or args.files[0])
    elif args.sub == "decode":
        enc = Encseq.load(args.indexname)
        from .core.seqio import write_fasta
        seqs = [enc.alphabet.decode(
            enc.codes[enc.seq_startpos(i):enc.seq_endpos(i) + 1]).upper()
            for i in range(enc.num_sequences)]
        write_fasta(sys.stdout, seqs, enc.descs)
    elif args.sub == "info":
        enc = Encseq.load(args.indexname)
        print(f"total length: {enc.total_length}")
        print(f"number of sequences: {enc.num_sequences}")
        print(f"special characters: {enc.special_ranges.total}")
        print(f"special ranges: {enc.special_ranges.count}")
        print(f"alphabet: {'dna' if enc.alphabet.is_dna() else 'protein'}")
    return 0


def _add_encseq(sub):
    p = sub.add_parser("encseq", help="encode/decode/inspect sequence sets")
    sp = p.add_subparsers(dest="sub", required=True)
    pe = sp.add_parser("encode")
    pe.add_argument("files", nargs="+")
    pe.add_argument("-indexname", default=None)
    pd = sp.add_parser("decode")
    pd.add_argument("indexname")
    pi = sp.add_parser("info")
    pi.add_argument("indexname")
    p.set_defaults(func=cmd_encseq)


# ---------------------------------------------------------------------------
# tallymer
# ---------------------------------------------------------------------------

def cmd_tallymer(args):
    _force_platform(args)
    from .core.encseq import Encseq
    from .index.esa import load_esa
    from .match import tallymer

    if args.sub == "mkindex":
        esa = load_esa(args.esa)
        mi = tallymer.mkindex(esa, args.mersize, minocc=args.minocc,
                              maxocc=args.maxocc)
        if args.indexname:
            mi.save(args.indexname)
        else:
            dist = tallymer.occurrence_distribution(mi)
            for count in sorted(dist):
                print(f"{count} {dist[count]}")
    elif args.sub == "search":
        mi = tallymer.MerIndex.load(args.tyr)
        q = Encseq.from_files(args.q)
        res = tallymer.search(mi, q, forward="fwd" in args.strand,
                              reverse="rev" in args.strand)
        show = args.output.split(",") if args.output else ["qseqnum", "qpos",
                                                           "counts"]
        for i in range(res.counts.size):
            fields = []
            for f in show:
                if f == "qseqnum":
                    fields.append(str(int(res.qseqnum[i])))
                elif f == "qpos":
                    fields.append(chr(res.strand[i]) + str(int(res.qpos[i])))
                elif f == "counts":
                    fields.append(str(int(res.counts[i])))
                elif f == "sequence":
                    fields.append(_code_to_seq(int(res.codes[i]), mi.mersize))
            print(" ".join(fields))
    return 0


def _code_to_seq(code: int, k: int) -> str:
    chars = "acgt"
    return "".join(chars[(code >> (2 * (k - 1 - i))) & 3] for i in range(k))


def _add_tallymer(sub):
    p = sub.add_parser("tallymer", help="k-mer counting and search")
    sp = p.add_subparsers(dest="sub", required=True)
    pm = sp.add_parser("mkindex")
    pm.add_argument("-esa", required=True, help="enhanced suffix array index")
    pm.add_argument("-mersize", type=int, default=20)
    pm.add_argument("-minocc", type=int, default=1)
    pm.add_argument("-maxocc", type=int, default=None)
    pm.add_argument("-indexname", default=None)
    pm.add_argument("--cpu", action="store_true")
    ps = sp.add_parser("search")
    ps.add_argument("-tyr", required=True, help="tallymer index")
    ps.add_argument("-q", nargs="+", required=True, help="query files")
    ps.add_argument("-strand", default="fp",
                    help="f=forward p=reverse ('fp' both)")
    ps.add_argument("-output", default="qseqnum,qpos,counts")
    ps.add_argument("--cpu", action="store_true")
    p.set_defaults(func=cmd_tallymer)


def _parse_strand(s: str):
    return ("f" in s, "p" in s)


# ---------------------------------------------------------------------------
# repfind
# ---------------------------------------------------------------------------

def cmd_repfind(args):
    _force_platform(args)
    from .core.encseq import Encseq
    from .index.esa import load_esa
    from .match.repfind import (format_match_lines, repfind_palindromic,
                                repfind_reverse, repfind_self)

    enc = Encseq.load(args.ii)
    if args.f or not (args.r or args.p):
        esa = load_esa(args.ii, encseq=enc)
        rows = repfind_self(enc, args.l, esa=esa)
        for line in format_match_lines(rows, "F"):
            print(line)
    if args.r:
        for line in format_match_lines(repfind_reverse(enc, args.l), "R"):
            print(line)
    if args.p:
        for line in format_match_lines(repfind_palindromic(enc, args.l), "P"):
            print(line)
    return 0


def _add_repfind(sub):
    p = sub.add_parser("repfind", help="maximal exact repeats")
    p.add_argument("-l", type=int, required=True, help="minimum length")
    p.add_argument("-ii", required=True, help="input index")
    p.add_argument("-f", action="store_true", help="forward matches (default)")
    p.add_argument("-r", action="store_true", help="reverse matches")
    p.add_argument("-p", action="store_true", help="reverse-strand matches")
    p.add_argument("--cpu", action="store_true")
    p.set_defaults(func=cmd_repfind)


# ---------------------------------------------------------------------------
# gff3 and annotation tools
# ---------------------------------------------------------------------------

def cmd_gff3(args):
    from .anno.gff3 import GFF3Writer, parse_gff3
    from .anno.node_stream import add_introns_stream, sort_stream
    import itertools
    nodes = []
    for p in args.files or ["-"]:
        text = sys.stdin.read() if p == "-" else open(p).read()
        nodes.extend(parse_gff3(text, strict=not args.tidy))
    stream = iter(nodes)
    if args.addintrons:
        stream = add_introns_stream(stream)
    if args.sort:
        stream = sort_stream(stream)
    out = GFF3Writer(retainids=args.retainids).render(list(stream))
    sys.stdout.write(out)
    return 0


def _add_gff3(sub):
    p = sub.add_parser("gff3", help="parse, validate and output GFF3")
    p.add_argument("files", nargs="*")
    p.add_argument("-sort", action="store_true")
    p.add_argument("-retainids", action="store_true")
    p.add_argument("-addintrons", action="store_true")
    p.add_argument("-tidy", action="store_true")
    p.set_defaults(func=cmd_gff3)


def cmd_stat(args):
    from .anno.gff3 import parse_gff3
    from .anno.node_stream import FeatureStats, stat_stream
    from .anno.genome_node import FeatureNode, RegionNode
    stats = FeatureStats()
    n_regions = 0
    for p in args.files:
        nodes = parse_gff3(open(p).read())
        n_regions += sum(isinstance(n, RegionNode) for n in nodes)
        list(stat_stream(nodes, stats))
    print(f"parsed genome node DAGs: "
          f"{stats.counts.get('gene', 0)}")
    print(f"sequence regions: {n_regions}")
    for t in sorted(stats.counts):
        print(f"{t}s: {stats.counts[t]}")
    return 0


def _add_stat(sub):
    p = sub.add_parser("stat", help="show statistics about GFF3 features")
    p.add_argument("files", nargs="+")
    p.set_defaults(func=cmd_stat)


# ---------------------------------------------------------------------------
# seqstat
# ---------------------------------------------------------------------------

def cmd_seqstat(args):
    from .core.seqio import read_seqfiles
    s = read_seqfiles(args.files)
    lens = np.array([len(x) for x in s.seqs], np.int64)
    total = int(lens.sum())
    print(f"# number of contigs:     {len(lens)}")
    print(f"# total contigs length:  {total}")
    print(f"# mean contig size:      {lens.mean():.2f}")
    print(f"# contig size first quartile: {int(np.percentile(lens, 25))}")
    print(f"# median contig size:         {int(np.median(lens))}")
    print(f"# contig size third quartile: {int(np.percentile(lens, 75))}")
    print(f"# longest contig:             {int(lens.max())}")
    print(f"# shortest contig:            {int(lens.min())}")
    # N50: largest L s.t. contigs >= L cover half the total
    sorted_lens = np.sort(lens)[::-1]
    csum = np.cumsum(sorted_lens)
    n50 = int(sorted_lens[np.searchsorted(csum, total / 2)])
    print(f"# contigs > 500 nt:           {(lens > 500).sum()} "
          f"({100.0 * (lens > 500).sum() / len(lens):.2f} %)")
    print(f"# N50:                {n50}")
    l50 = int(np.searchsorted(csum, total / 2)) + 1
    print(f"# L50:                {l50}")
    return 0


def _add_seqstat(sub):
    p = sub.add_parser("seqstat", help="sequence set statistics")
    p.add_argument("files", nargs="+")
    p.set_defaults(func=cmd_seqstat)


# ---------------------------------------------------------------------------
# main dispatch
# ---------------------------------------------------------------------------

_REGISTER = [_add_suffixerator, _add_encseq, _add_tallymer, _add_repfind,
             _add_seqstat, _add_gff3, _add_stat]


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="gt-tpu",
        description="TPU-native sequence indexing and matching toolkit")
    sub = parser.add_subparsers(dest="tool", required=True)
    for add in _REGISTER:
        add(sub)
    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
