#!/usr/bin/env python3
"""Rebuild .data/sf10_chunks.json for tools/sf10_sweep_r15.sh from the
live query registry.

Usage:
    python3 tools/build_sf10_chunks.py <oracle_sql.json> [--all]

<oracle_sql.json> is a registry dump — produce one with a no-match
Verify run:  tools/run_main.sh graft.Verify /root/testdata/sf0.001 \
             .data/names_probe __none__

Default scope is the round-15 family split: the full registry MINUS
the 211 relational+dedup gates the round-14 sweep already proved at
sf10 (prefixes tpch/tpcds/join/agg/win/over/sort/setop/topn/distinct/
subq/bucket + ddl_alter_columns + the dedup five). --all chunks the
whole registry (for a from-scratch sweep at a new scale).

Chunk order in the sweep script banks cheap families first and runs
the hot-key floods last (their oracles are the likeliest blow-up).
"""
import json
import sys

DEDUP5 = {'dedup_exact_text', 'dedup_minhash_lsh', 'dedup_incremental_lsh',
          'dedup_lsh_clusters', 'dedup_embedding_cosine'}
COVERED_PREFIXES = ('tpch_', 'tpcds_', 'join_', 'agg_', 'win_', 'over_',
                    'sort_', 'setop_', 'topn_', 'distinct_', 'subq_', 'bucket_')


def build(registry, include_all=False):
    reg = sorted(registry)
    if include_all:
        rem = reg
    else:
        covered = ({n for n in reg if n.startswith(COVERED_PREFIXES)}
                   | {'ddl_alter_columns'} | DEDUP5)
        rem = [n for n in reg if n not in covered]
    floods = [n for n in rem if 'hotkey_flood' in n]
    cep = [n for n in rem if n.startswith('stream_cep_') and n not in floods]
    stream = [n for n in rem if n.startswith('stream_')
              and n not in cep and n not in floods]
    text = [n for n in rem if n.startswith('text_')]
    graph = [n for n in rem if n.startswith('graph_')]
    ms = [n for n in rem if n.startswith(('match_', 'state_', 'changelog_'))]
    sim = [n for n in rem if n.startswith(('sim_', 'dedup_'))]
    rest = [n for n in rem
            if n not in floods + cep + stream + text + graph + ms + sim]
    half = (len(stream) + 1) // 2
    chunks = {
        'c3_text': text, 'c4_graph': graph, 'c2_match_state': ms,
        'c1a_stream': stream[:half], 'c1b_stream': stream[half:],
        'c1c_cep': cep, 'c6_sim': sim, 'c5_misc': rest, 'c7_flood': floods,
    }
    assert sum(len(v) for v in chunks.values()) == len(rem)
    return chunks


if __name__ == '__main__':
    args = [a for a in sys.argv[1:] if a != '--all']
    registry = json.load(open(args[0] if args
                              else '.data/names_probe/oracle_sql.json'))
    chunks = build(registry, include_all='--all' in sys.argv)
    json.dump(chunks, open('.data/sf10_chunks.json', 'w'), indent=1)
    print({k: len(v) for k, v in chunks.items()},
          'total', sum(len(v) for v in chunks.values()))
