"""Speech-graph feature pack (reference: text_features/extract_graph.py,
after Mota et al. 2012 / Carrillo et al.).

Per entity: build word-adjacency MultiDiGraphs (consecutive words within a
turn) in three variants — naive (lowercased whitespace words), lemma
(mixed-case single-space words, suffix lemmatizer — documented deviation
from WordNet), pos (rule-tagger tags, documented deviation from nltk) — and
compute: num_nodes, num_edges, ave_degree, lcc, lsc, num_p_edges, l1,
density d, diameter di, average shortest path asp, each x3 variants, plus
``_norm`` copies divided by word count (extract_graph.py:236-242).
l2/l3 are NOT emitted (disabled in the reference, :215).

This is the one genuinely non-relational kernel: whole-group graph algebra.
Spark surface: grouped-map ``applyInPandas`` — per-entity work, Arrow
transfer, one shuffle keyed by the entity. Per-conversation graphs are
vocabulary-sized (small), so all-pairs BFS per component is bounded; the
skew risk is many-turn conversations, handled upstream by AQE + salting
for the other packs (graphs must see the whole group, so hot groups are the
kernel's O(V*E) cost — documented).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_extraction_spark.functions.postag import lemmatize_simple, penn_tag
from feature_extraction_spark.ops.levels import keys_for

NAN = float("nan")

GRAPH_TYPES = ("naive", "lemma", "pos")
_BASE_FEATS = [
    "num_nodes", "num_edges", "ave_degree", "lcc", "lsc",
    "num_p_edges", "l1", "d", "di", "asp",
]


def _graph_metrics(edge_list, node_only, prefix, out):
    """Metrics over one directed multigraph given its edge list and isolated
    nodes (reference get_graph_metrics, extract_graph.py:189-226)."""
    import networkx as nx

    g = nx.MultiDiGraph()
    g.add_edges_from(edge_list)
    g.add_nodes_from(node_only)

    n = g.number_of_nodes()
    e = g.number_of_edges()
    out[f"num_nodes_{prefix}"] = float(n)
    out[f"num_edges_{prefix}"] = float(e)

    # average total degree (in+out, parallel edges count)
    out[f"ave_degree_{prefix}"] = (
        sum(d for _, d in g.degree()) / n if n else NAN
    )

    ug = g.to_undirected()
    comps = list(nx.connected_components(ug))
    out[f"lcc_{prefix}"] = float(max((len(c) for c in comps), default=0))
    sccs = nx.strongly_connected_components(g)
    out[f"lsc_{prefix}"] = float(max((len(c) for c in sccs), default=0))

    # parallel edges: per distinct directed pair, occurrences-1
    # (hash count — the reference's list.count scan is O(E^2), SURVEY §4.1)
    cnt = Counter(g.edges())  # (u, v) pairs, multiplicity via Counter
    p_edges = 0
    pe_l1 = 0
    for (u, v), occ in cnt.items():
        if occ > 1:
            p_edges += occ - 1
            if u == v:
                pe_l1 += occ - 1
    out[f"num_p_edges_{prefix}"] = float(p_edges)
    l1 = sum(1 for u, v in g.edges() if u == v)
    out[f"l1_{prefix}"] = float(l1)

    e_prime = e - (l1 + p_edges - pe_l1)
    if e_prime < 0:
        out[f"d_{prefix}"] = NAN
    elif n:
        out[f"d_{prefix}"] = e_prime / float(n * n)
    else:
        out[f"d_{prefix}"] = NAN

    # diameter + average shortest path over all undirected components
    longest = 0
    total = 0.0
    num_pairs = 0.0
    for comp in comps:
        sub = ug.subgraph(comp)
        nodes = list(sub.nodes())
        k = len(nodes)
        num_pairs += k * (k - 1) / 2
        lengths = dict(nx.all_pairs_shortest_path_length(sub))
        for i in range(k):
            li = lengths[nodes[i]]
            for j in range(i + 1, k):
                pl = li[nodes[j]]
                if pl > longest:
                    longest = pl
                total += pl
    out[f"di_{prefix}"] = float(longest)
    out[f"asp_{prefix}"] = (total / num_pairs) if num_pairs else 0.0


def _edges_from_segments(segments):
    edges, singles = [], []
    for seg in segments:
        for i in range(len(seg) - 1):
            edges.append((seg[i], seg[i + 1]))
        if len(seg) == 1:
            singles.append(seg[0])
    return edges, singles


def graph_feats_for_texts(texts: list[str]) -> dict[str, float]:
    """Pure kernel: the reference's extract_graph_feats semantics
    (extract_graph.py:245-284) with identity truecase."""
    mixed = []
    lower = []
    for s in texts:
        mw = [w for w in s.split(" ") if w != ""]
        mixed.append(mw)
        lower.append([w for w in s.lower().split() if w != ""])

    out: dict[str, float] = {}
    e, s_ = _edges_from_segments(lower)
    _graph_metrics(e, s_, "naive", out)

    lemma = [[lemmatize_simple(w) for w in seg] for seg in mixed]
    e, s_ = _edges_from_segments(lemma)
    _graph_metrics(e, s_, "lemma", out)

    pos = [[penn_tag(w) for w in seg] for seg in mixed]
    e, s_ = _edges_from_segments(pos)
    _graph_metrics(e, s_, "pos", out)

    # word count for _norm uses the raw single-space split INCLUDING ''
    # (reference get_word_count on segments split at :256-262 -> ''-filtered
    # mixed-case words)
    wc = sum(len(seg) for seg in mixed)
    for k in list(out.keys()):
        out[f"{k}_norm"] = out[k] / wc if wc else NAN
    return out


def graph_features(
    transcripts: DataFrame, level: str = "conv", text_col: str = "text"
) -> DataFrame:
    """Grouped-map kernel: one row of graph features per entity."""
    keys = keys_for(level)
    feat_names = [f"{b}_{g}" for g in GRAPH_TYPES for b in _BASE_FEATS]
    feat_names += [f"{n}_norm" for n in feat_names]
    key_fields = [
        T.StructField(f.name, f.dataType) for f in transcripts.select(*keys).schema
    ]
    schema = T.StructType(
        key_fields + [T.StructField(n, T.DoubleType()) for n in feat_names]
    )

    order_cols = [c for c in ("ts", "turn_idx") if c in transcripts.columns]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols) if order_cols else pdf
        feats = graph_feats_for_texts(list(pdf[text_col].fillna("")))
        row = {k: pdf[k].iloc[0] for k in keys}
        row.update({n: feats[n] for n in feat_names})
        return pd.DataFrame([row])

    cols = keys + order_cols + [text_col]
    return (
        transcripts.select(*dict.fromkeys(cols))
        .groupBy(*keys)
        .applyInPandas(kernel, schema=schema)
    )
