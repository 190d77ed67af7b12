"""Source connectors (SURVEY.md §2.1).

``batch``:   parquet/csv/in-memory bounded sources.
``streams``: Structured Streaming sources — file replay of
             pre-stamped event files (the deterministic-test pattern
             the reference builds in ``StreamSourceMock.scala`` /
             ``TestSource.java``), rate-source generators, socket and
             kafka thin wrappers.
"""
