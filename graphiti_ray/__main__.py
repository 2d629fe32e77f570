"""CLI entry points — the `ray job submit` surface.

    python -m graphiti_ray build  --sf-dir /root/testdata/sf0.01 --out /tmp/kg
    python -m graphiti_ray build  --pages /data/cc/*.parquet    --out /tmp/kg
    python -m graphiti_ray search --kg /tmp/kg --query "Alice Smith works at"
    python -m graphiti_ray eval   --sf-dir /root/testdata/sf0.01

On a cluster: ``ray job submit -- python -m graphiti_ray build ...`` — the
script initialises Ray only when no session exists (job driver provides
one), and a rerun resumes from the per-table checkpoints.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args) -> int:
    _ensure_ray(args.num_cpus)
    from graphiti_ray.pipelines.kg import run_kg

    if args.pages:
        # real pages input: write an episodes-first pipeline over it
        from graphiti_ray.sources.pages import read_pages
        from graphiti_ray.stages.extract import episodes_dataset
        from graphiti_ray.state.checkpoint import checkpointed_write

        eps = episodes_dataset(
            read_pages(args.pages, lang_filter=args.lang), check_invariant=False
        )
        checkpointed_write(eps, args.out, "episodes", {"input": args.pages})
        metrics = run_kg(
            args.sf_dir or "",
            args.out,
            communities=args.communities,
            node_summaries=args.node_summaries,
        )
    else:
        metrics = run_kg(
            args.sf_dir,
            args.out,
            replicate=args.replicate,
            communities=args.communities,
            node_summaries=args.node_summaries,
        )
    print(json.dumps(metrics))
    return 0


def cmd_search(args) -> int:
    _ensure_ray(args.num_cpus)
    from graphiti_ray.pipelines.dataset_search import KGDatasetSearcher
    from graphiti_ray.pipelines.search import COMBINED_HYBRID_SEARCH_RRF
    from graphiti_ray.state.checkpoint import read_table

    # dataset-mode searcher: scoring streams over the parquet tables;
    # nothing but the top-k rows reaches the driver
    searcher = KGDatasetSearcher(
        {
            "nodes": read_table(args.kg, "nodes"),
            "edges": read_table(args.kg, "edges"),
            "episodes": read_table(args.kg, "episodes"),
        }
    )
    res = searcher.search(args.query, COMBINED_HYBRID_SEARCH_RRF)
    out = {
        "edges": res.edges[["fact", "valid_at", "invalid_at"]].astype(str).to_dict("records")
        if len(res.edges)
        else [],
        "nodes": res.nodes[["name", "group_id"]].to_dict("records")
        if len(res.nodes)
        else [],
    }
    print(json.dumps(out, indent=2, default=str))
    return 0


def cmd_eval(args) -> int:
    import os
    import runpy

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "eval_pr.py",
    )
    sys.argv = [script, args.sf_dir]
    runpy.run_path(script, run_name="__main__")
    return 0


def cmd_serve(args) -> int:
    _ensure_ray(args.num_cpus)
    if args.transport == "mcp-stdio":
        from graphiti_ray.serving.mcp_stdio import main as stdio_main

        stdio_main(["--root", args.kg])
        return 0
    if args.transport == "mcp-http":
        from graphiti_ray.serving.mcp_http import main as http_main

        http_main(["--root", args.kg, "--host", args.host, "--port", str(args.port)])
        return 0
    from graphiti_ray.serving.rest_http import main as rest_main

    rest_main(["--root", args.kg, "--host", args.host, "--port", str(args.port)])
    return 0


def cmd_query(args) -> int:
    """Run one registered pipeline by name (the __ray_entry__ surface)
    and print row count + the first rows as JSON lines."""
    _ensure_ray(args.num_cpus)
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    qs = entry.queries()
    if args.name == "list" or args.name not in qs:
        for n in qs:
            print(n)
        return 0 if args.name == "list" else 1
    res = qs[args.name](args.sf_dir)
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        df = res.limit(args.head).to_pandas()
        n = res.count()
    elif isinstance(res, pa.Table):
        df, n = res.to_pandas().head(args.head), res.num_rows
    else:
        df, n = pd.DataFrame(res).head(args.head), len(res)
    print(json.dumps({"query": args.name, "rows": int(n)}))
    print(df.to_string())
    return 0


def main() -> int:
    p = argparse.ArgumentParser(prog="graphiti_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="run the KG pipeline to a checkpointed output dir")
    b.add_argument("--sf-dir", default=None, help="synthetic documents dir")
    b.add_argument("--pages", default=None, help="real pages parquet path/glob")
    b.add_argument("--lang", default=None, help="language filter for real pages")
    b.add_argument("--out", required=True)
    b.add_argument("--replicate", type=int, default=1)
    b.add_argument("--communities", action="store_true", help="also build community tables")
    b.add_argument(
        "--node-summaries", action="store_true", help="fact-derived node summaries (M5)"
    )
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="hybrid search over a built KG")
    s.add_argument("--kg", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--num-cpus", type=int, default=None)
    s.set_defaults(fn=cmd_search)

    e = sub.add_parser("eval", help="triple P/R vs ground truth")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    e.set_defaults(fn=cmd_eval)

    q = sub.add_parser(
        "query", help="run one registered pipeline by name ('list' to list)"
    )
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--head", type=int, default=10)
    q.add_argument("--num-cpus", type=int, default=None)
    q.set_defaults(fn=cmd_query)

    v = sub.add_parser(
        "serve", help="serve a built KG (rest | mcp-stdio | mcp-http)"
    )
    v.add_argument("--kg", required=True)
    v.add_argument(
        "--transport", choices=["rest", "mcp-stdio", "mcp-http"], default="rest"
    )
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8809)
    v.add_argument("--num-cpus", type=int, default=None)
    v.set_defaults(fn=cmd_serve)

    args = p.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
