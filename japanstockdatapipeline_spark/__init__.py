"""PySpark-native analytics engine with the query/data-processing
capabilities of syukan3/JapanStockDataPipeline (see SURVEY.md).

Brand-new engine, DataFrame/SQL-first: declarative logical plans,
Catalyst/AQE do the physical planning. Pandas UDFs only where the
reference semantics are genuinely recursive (Wilder smoothers).
"""

__version__ = "0.1.0"
