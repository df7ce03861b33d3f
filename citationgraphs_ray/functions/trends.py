"""Year-bucketed trend analytics (SURVEY.md A15-A18, T6-T7 shapes).

Reference semantics: SortByYear groups titles per year
(CitationGraphs.go:4084-4103); GetEmergingTrends keeps labels that were
cold in a far window and hot recently (3870-3924); GetEmergingTopic/
HotTopicPublications scan per-node in-citation year histograms
(3931-4013, 4019-4075); Leap2Trend joins per-year similarity ranks and
emits rank jumps (4237-4331). All are filters + grouped aggregations +
joins over (key, year) tables — no iteration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..utils import broadcast_merge, fast_grouped_agg


def counts_by_year(
    ds: ray.data.Dataset, key_col: str, year_col: str = "year"
) -> ray.data.Dataset:
    """(key, year, n) grouped counts — the A15/A16 base aggregation."""
    return fast_grouped_agg(ds, [key_col, year_col], count_as="n")


def emerging_trends(
    ds: ray.data.Dataset,
    key_col: str,
    year_col: str,
    year_far_away: int,
    year_today: int,
    low_threshold: int,
    high_threshold: int,
) -> ray.data.Dataset:
    """A16 cold-then-hot filter: keys with < low_threshold occurrences in
    years ≤ year_far_away AND ≥ high_threshold in years > year_far_away
    (window capped at year_today). Returns (key, far_count, recent_count)."""

    def bucket(batch: pa.Table) -> pa.Table:
        y = batch[year_col].to_numpy(zero_copy_only=False)
        keep = y <= year_today
        far = (y <= year_far_away) & keep
        recent = (y > year_far_away) & keep
        return pa.table(
            {
                key_col: batch[key_col],
                "far": pa.array(far.astype(np.int64)),
                "recent": pa.array(recent.astype(np.int64)),
            }
        ).filter(pa.array(keep))

    agg = fast_grouped_agg(
        ds.map_batches(bucket, batch_format="pyarrow"),
        [key_col],
        {"far_count": ("far", "sum"), "recent_count": ("recent", "sum")},
    )

    def keep(t: pa.Table) -> pa.Table:
        far = t["far_count"].to_numpy(zero_copy_only=False)
        rec = t["recent_count"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((far < low_threshold) & (rec >= high_threshold)))

    return agg.map_batches(keep, batch_format="pyarrow")


def citation_year_histogram(
    edges: ray.data.Dataset,
    node_years: ray.data.Dataset,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """G4: per (cited node, citing year) counts — ``edges ⋈ years ON
    edges.src = years.id`` then groupby(dst, year). Returns
    (id, year, n_citations). node_years is the broadcast small side."""
    j = broadcast_merge(edges, node_years, left_on="src", right_on="id")
    agg = fast_grouped_agg(j, ["dst", "year"], count_as="n_citations")
    return agg.map_batches(
        lambda t: pa.table(
            {"id": t["dst"], "year": t["year"], "n_citations": t["n_citations"]}
        ),
        batch_format="pyarrow",
    )


def hot_topic_publications(
    edges: ray.data.Dataset,
    node_years: ray.data.Dataset,
    high_threshold: int,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """A18: nodes with ≥ high_threshold citations arriving in their
    publication year or the following year (citing-year < publication-year
    rows are excluded, CitationGraphs.go:4044). Returns (id, early_citations).
    """
    hist = citation_year_histogram(edges, node_years, num_partitions)
    j = broadcast_merge(
        hist, node_years, left_on="id", right_on="id", suffixes=("_cite", "_pub")
    )

    def early(batch: pa.Table) -> pa.Table:
        cy = batch["year_cite"].to_numpy(zero_copy_only=False)
        py = batch["year_pub"].to_numpy(zero_copy_only=False)
        n = batch["n_citations"].to_numpy(zero_copy_only=False)
        keep = (cy >= py) & (cy <= py + 1)
        return pa.table(
            {
                "id": batch["id"],
                "early": pa.array(np.where(keep, n, 0).astype(np.int64)),
            }
        )

    agg = fast_grouped_agg(
        j.map_batches(early, batch_format="pyarrow"),
        ["id"],
        {"early_citations": ("early", "sum")},
    )

    def keep(t: pa.Table) -> pa.Table:
        e = t["early_citations"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(e >= high_threshold))

    return agg.map_batches(keep, batch_format="pyarrow")


def rank_jumps(
    prev_ranks: ray.data.Dataset,
    cur_ranks: ray.data.Dataset,
    min_jump: int = 1,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """T7 core: join (phrase1, phrase2, rank) tables of two successive
    years, jump = prev_rank − rank (rank improvements are positive), filter
    jump ≥ min_jump, global sort desc (CitationGraphs.go:4306-4326)."""
    j = cur_ranks.join(
        prev_ranks,
        join_type="inner",
        num_partitions=num_partitions,
        on=("phrase1", "phrase2"),
        left_suffix="_cur",
        right_suffix="_prev",
    )

    def jump(batch: pa.Table) -> pa.Table:
        cur = batch["rank_cur"].to_numpy(zero_copy_only=False)
        prev = batch["rank_prev"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "phrase1": batch["phrase1"],
                "phrase2": batch["phrase2"],
                "jump": pa.array((prev - cur).astype(np.int64)),
            }
        )

    return (
        j.map_batches(jump, batch_format="pyarrow")
        .filter(expr=f"jump >= {min_jump}")
        .sort(["jump", "phrase1", "phrase2"], descending=[True, False, False])
    )


def neighbor_ranks(
    sims: ray.data.Dataset,
) -> ray.data.Dataset:
    """T6: per phrase1, rank neighbors by similarity desc (ties by phrase2
    asc); emits (phrase1, phrase2, rank) with rank starting at 1."""

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["sim", "phrase2"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["phrase1", "phrase2", "rank"]]

    return sims.groupby("phrase1").map_groups(rank_group, batch_format="pandas")


def titles_by_year(
    ds: ray.data.Dataset, title_col: str = "title", year_col: str = "year"
) -> ray.data.Dataset:
    """A15 (SortByYear, 4084-4103): (year, titles: list<string>) — grouped
    collect, titles sorted within year for determinism."""

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                year_col: [g[year_col].iloc[0]],
                "titles": [sorted(g[title_col].tolist())],
            }
        )

    return ds.groupby(year_col).map_groups(collect, batch_format="pandas")


def emerging_topic_publications(
    edges: ray.data.Dataset,
    node_years: ray.data.Dataset,
    year_far_away: int,
    low_threshold: int,
    high_threshold: int,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """A17 (GetEmergingTopicPublications, 3931-4013): nodes whose
    in-citation history is cold early then breaks out — fewer than
    ``low_threshold`` citations in years ≤ year_far_away AND a mean of
    ≥ ``high_threshold`` citations/year after. Returns
    (id, cold_citations, hot_mean)."""
    hist = citation_year_histogram(edges, node_years, num_partitions)

    def bucket(batch: pa.Table) -> pa.Table:
        y = batch["year"].to_numpy(zero_copy_only=False)
        n = batch["n_citations"].to_numpy(zero_copy_only=False)
        cold = np.where(y <= year_far_away, n, 0).astype(np.int64)
        hot_n = np.where(y > year_far_away, n, 0).astype(np.int64)
        hot_years = (y > year_far_away).astype(np.int64)
        return pa.table(
            {
                "id": batch["id"],
                "cold": pa.array(cold),
                "hot_n": pa.array(hot_n),
                "hot_years": pa.array(hot_years),
            }
        )

    agg = fast_grouped_agg(
        hist.map_batches(bucket, batch_format="pyarrow"),
        ["id"],
        {
            "cold_citations": ("cold", "sum"),
            "hot_total": ("hot_n", "sum"),
            "hot_year_count": ("hot_years", "sum"),
        },
    )

    def keep(t: pa.Table) -> pa.Table:
        cold = t["cold_citations"].to_numpy(zero_copy_only=False)
        tot = t["hot_total"].to_numpy(zero_copy_only=False)
        ny = t["hot_year_count"].to_numpy(zero_copy_only=False)
        mean = np.where(ny > 0, tot / np.maximum(ny, 1), 0.0)
        mask = (cold < low_threshold) & (mean >= high_threshold)
        out = pa.table(
            {
                "id": t["id"],
                "cold_citations": pa.array(cold),
                "hot_mean": pa.array(mean),
            }
        )
        return out.filter(pa.array(mask))

    return agg.map_batches(keep, batch_format="pyarrow")
