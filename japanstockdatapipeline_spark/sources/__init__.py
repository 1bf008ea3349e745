from .tables import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_data_sources"]


def register_data_sources(spark) -> None:
    """Register the custom Python data sources on a session —
    `spark.read.format("paged_api")` and its stream/sink forms
    become available after this call."""
    from .paged_source import PagedApiDataSource

    spark.dataSource.register(PagedApiDataSource)
