"""Physical-plan introspection helpers.

``DataFrame.explain()`` prints to stdout and returns None, so it
cannot back a plan assertion. ``plan_str`` returns the explain text —
the repo's plan-shape tests (and any user wanting to assert "no
Exchange on this join") go through it.

Mode guide: ``"simple"`` lists each physical operator exactly once
(occurrence counts are meaningful — use it to count Exchanges);
``"formatted"`` repeats operators in a detail section but carries
scan attributes (ReadSchema, PushedFilters, Bucketed: true) and
codegen ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )
