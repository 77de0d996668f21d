"""Import-side-effect module: importing this registers every query
module's entries into ``dados_publicos_etl_spark.plans.QUERIES``.
"""

import dados_publicos_etl_spark.operators.bucketing  # noqa: F401
import dados_publicos_etl_spark.operators.classify  # noqa: F401
import dados_publicos_etl_spark.operators.corpus  # noqa: F401
import dados_publicos_etl_spark.operators.dedup  # noqa: F401
import dados_publicos_etl_spark.operators.graph  # noqa: F401
import dados_publicos_etl_spark.operators.linkage  # noqa: F401
import dados_publicos_etl_spark.operators.merge  # noqa: F401
import dados_publicos_etl_spark.operators.multimodal  # noqa: F401
import dados_publicos_etl_spark.operators.privacy  # noqa: F401
import dados_publicos_etl_spark.operators.quality  # noqa: F401
import dados_publicos_etl_spark.operators.sampling  # noqa: F401
import dados_publicos_etl_spark.operators.similarity  # noqa: F401
import dados_publicos_etl_spark.operators.skew  # noqa: F401
import dados_publicos_etl_spark.operators.text  # noqa: F401
import dados_publicos_etl_spark.operators.webprep  # noqa: F401
import dados_publicos_etl_spark.plans.advanced  # noqa: F401
import dados_publicos_etl_spark.plans.events  # noqa: F401
import dados_publicos_etl_spark.plans.maintenance  # noqa: F401
import dados_publicos_etl_spark.plans.mining  # noqa: F401
import dados_publicos_etl_spark.plans.relational  # noqa: F401
import dados_publicos_etl_spark.plans.scoring  # noqa: F401
import dados_publicos_etl_spark.plans.stats2  # noqa: F401
import dados_publicos_etl_spark.plans.stats3  # noqa: F401
import dados_publicos_etl_spark.plans.timeseries  # noqa: F401
import dados_publicos_etl_spark.plans.tpch_extra  # noqa: F401
import dados_publicos_etl_spark.plans.tpch_full  # noqa: F401
import dados_publicos_etl_spark.streaming.sinks  # noqa: F401
import dados_publicos_etl_spark.streaming.windows  # noqa: F401

__all__: list[str] = []
