#!/usr/bin/env python3
"""Full property-level parity check: graft.GraphDump output vs the
independent reference-semantics replay (sysmon_oracle).

Usage:
  sbt -batch 'runMain graft.GraphDump "/root/reference/malware/*.json" /tmp/graph_props'
  python3 tools/props_compare.py /tmp/graph_props /root/reference/malware
"""
import glob
import json
import sys

import duckdb

sys.path.insert(0, __file__.rsplit('/', 1)[0])
from sysmon_oracle import load  # noqa: E402


def propmap(x):
    if x is None:
        return {}
    if isinstance(x, dict) and set(x.keys()) == {'key', 'value'}:
        return {k: v for k, v in zip(x['key'], x['value']) if v is not None}
    return {k: v for k, v in x.items() if v is not None}


def main(dump_dir, trace_dir):
    onodes, oedges = load(sorted(glob.glob(f'{trace_dir}/*.json')))
    on = {(l, i): {k: str(v) for k, v in p.items() if v is not None}
          for (l, i), p in onodes.items()}
    oe = {(t, s, d): {k: str(v) for k, v in p.items() if v is not None}
          for (t, s, d), p in oedges.items()}
    con = duckdb.connect()
    nodes = con.execute(
        f"SELECT * FROM read_parquet('{dump_dir}/nodes/*/*.parquet', hive_partitioning=1)").fetchdf()
    edges = con.execute(
        f"SELECT * FROM read_parquet('{dump_dir}/edges/*/*.parquet', hive_partitioning=1)").fetchdf()
    nm = 0
    for r in nodes.itertuples():
        exp = on.get((r.label, r.id))
        got = propmap(r.props)
        got.pop('main', None)
        if exp is None or got != exp:
            if nm < 10:
                print("NODE DIFF", r.label, str(r.id)[:70], "got=", got, "exp=", exp)
            nm += 1
    em = 0
    for r in edges.itertuples():
        exp = oe.get((r.etype, r.src, r.dst))
        if exp is None or propmap(r.props) != exp:
            if em < 10:
                print("EDGE DIFF", r.etype, str(r.src)[:40], str(r.dst)[:40])
            em += 1
    print(f"nodes {len(nodes)} checked, {nm} mismatches; "
          f"oracle had {len(on)} ({len(on) - len(nodes)} missing)")
    print(f"edges {len(edges)} checked, {em} mismatches; "
          f"oracle had {len(oe)} ({len(oe) - len(edges)} missing)")
    sys.exit(1 if (nm or em or len(on) != len(nodes) or len(oe) != len(edges)) else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
