"""Command-line interface (capability of reference keyhunt.cpp main/menu,
:489-778 getopt loop and :5741-5773 menu).

Implemented modes: bsgs, address, rmd160, xpoint, eth.
Example:
    python -m keyhuntm1cpu_tpu.cli -m bsgs -f targets.pub \
        -r 400000000000000:800000000000000 --m-babies 4194304 -S
"""

from __future__ import annotations

import argparse
import sys
import time

from .engine.bsgs import BSGSEngine, BSGSParams
from .engine.brute import BruteEngine, BruteParams
from .engine.common import write_found_key
from .utils.targets import parse_target_file


def parse_range(s: str):
    if ":" not in s:
        raise argparse.ArgumentTypeError("range must be start:end (hex)")
    a, b = s.split(":", 1)
    return int(a, 16), int(b, 16)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="keyhunt-tpu",
        description="TPU-native secp256k1 key search (BSGS + brute modes)",
    )
    p.add_argument("-m", "--mode", required=True,
                   choices=["bsgs", "address", "rmd160", "xpoint", "eth"],
                   help="search mode (reference -m)")
    p.add_argument("-f", "--file", required=True, help="target file (reference -f)")
    p.add_argument("-r", "--range", type=parse_range, required=True,
                   help="start:end hex key range (reference -r)")
    p.add_argument("--m-babies", type=int, default=1 << 22,
                   help="BSGS baby-table size m (reference -n/-k sizing)")
    p.add_argument("-u", "--block-u", type=int, default=4096,
                   help="giant centers / walk offsets per device step")
    p.add_argument("--chunk-steps", type=int, default=8,
                   help="device steps per jit chunk")
    p.add_argument("-w", "--walkers", type=int, default=8,
                   help="brute-mode parallel walkers (reference -t threads)")
    p.add_argument("-S", "--save-table", action="store_true",
                   help="cache the BSGS baby table to disk (reference -S)")
    p.add_argument("--table-file", default=None, help="baby table cache path")
    p.add_argument("-6", "--skip-checksum", action="store_true", dest="skip_checksum",
                   help="skip table checksum verification (reference -6)")
    p.add_argument("--sharded", action="store_true",
                   help="shard the range across all visible devices")
    p.add_argument("-s", "--stats-every", type=float, default=5.0,
                   help="progress print interval factor (reference -s)")
    p.add_argument("-q", "--quiet", action="store_true", help="reference -q")
    p.add_argument("--all", action="store_true",
                   help="keep searching after the first found key")
    p.add_argument("--uncompressed", action="store_true",
                   help="hash uncompressed pubkeys (reference -l uncompress)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    a, b = args.range
    found = []

    if args.mode == "bsgs":
        targets = parse_target_file(args.file, "pubkey")
        params = BSGSParams(
            m=args.m_babies, block_u=args.block_u, steps_per_chunk=args.chunk_steps
        )
        table = None
        cache = args.table_file or f"keyhunt_tpu_baby_{args.m_babies}.npz"
        if args.save_table:
            try:
                table = BSGSEngine.load_table(
                    cache, verify_checksum=not args.skip_checksum
                )
                if not args.quiet:
                    print(f"[+] loaded baby table from {cache}")
            except (FileNotFoundError, ValueError):
                table = None
        if args.sharded:
            from .parallel import ShardedBSGSEngine

            eng = ShardedBSGSEngine(targets.pubkeys, a, b, params, table=table)
            if args.save_table and table is None:
                eng.save_table(cache)
            found = eng.search_sharded(
                stop_on_first=not args.all,
                progress_every=0 if args.quiet else max(1, int(args.stats_every)),
            )
        else:
            eng = BSGSEngine(targets.pubkeys, a, b, params, table=table)
            if args.save_table and table is None:
                eng.save_table(cache)
            found = eng.search(
                stop_on_first=not args.all,
                progress_every=0 if args.quiet else max(1, int(args.stats_every)),
            )
        if not args.quiet:
            print(f"[+] {eng.stats.human()} ({eng.stats.keys_covered:.3e} keys)")
    else:
        kind = {"address": "address", "rmd160": "rmd160",
                "xpoint": "xpoint", "eth": "eth"}[args.mode]
        targets = parse_target_file(args.file, kind)
        mode = args.mode
        if mode == "address" and args.uncompressed:
            mode = "address_u"
        params = BruteParams(
            walkers=args.walkers,
            block_u=args.block_u,
            steps_per_chunk=args.chunk_steps,
        )
        eng = BruteEngine(targets, a, b, mode=mode, params=params)
        found = eng.search(
            stop_on_first=not args.all,
            progress_every=0 if args.quiet else max(1, int(args.stats_every)),
        )
        if not args.quiet:
            print(f"[+] {eng.stats.human()} ({eng.stats.keys_covered:.3e} keys)")

    for f in found:
        write_found_key(f)
        print(f"[+] FOUND {f.private_key:064x} -> {f.target}")
    if not found:
        print("[+] no key found in range")
    return 0 if found else 1


if __name__ == "__main__":
    sys.exit(main())
