"""Streaming layer.

The reference's "real-time" is a 60 s stateless poll tick
(``st_autorefresh``, app.py:37). Here that becomes Structured Streaming:
``poll`` ports the tick itself; ``time_windows`` implements
tumbling/sliding/session windows (batch-expressible shapes get DuckDB
oracles); ``stateful`` adds watermarks, streaming dedup and
``transformWithStateInPandas``-style per-key state.
"""
