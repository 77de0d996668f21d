"""Import-side-effect module: importing this registers every query
module's entries into ``dados_publicos_etl_spark.plans.QUERIES``.
"""

import dados_publicos_etl_spark.plans.relational  # noqa: F401

__all__: list[str] = []
