"""Runnable example mirroring the reference's example pipeline
(`examples/pivot_file_source_sink_example-cdap-data-pipeline.json`):
delimited file source -> Pivot (2 pivot columns, sum) -> file sink,
with the error port wired to a second sink.

    python examples/file_pipeline_example.py [workdir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pivot_spark import PivotConfig
from pivot_spark.session import get_spark
from pivot_spark.sources.io import read_source, run_file_pipeline

SAMPLE = """Quarter,Product,Brand,Sales,ShopID
Q1,Shoes,Nike,50,1
Q1,Shirts,Nike,20,1
Q1,Socks,Reebok,40,1
Q2,Shoes,Reebok,30,1
Q2,Socks,Nike,40,1
Q3,Shoes,Nike,50,1
Q4,Shirts,Reebok,60,1
"""


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="pivot_example_")
    src = os.path.join(work, "sample_data.csv")
    with open(src, "w") as f:
        f.write(SAMPLE)

    spark = get_spark("pivot-example")
    spark.sparkContext.setLogLevel("ERROR")

    cfg = PivotConfig(
        pivot_columns="Quarter=Q1,Q2,Q3,Q4;Brand=Nike,Reebok",
        pivot_rows="Product",
        aggregates="Sum:sum(Sales)",
        default_value="0",
    )
    out = run_file_pipeline(
        spark,
        src,
        cfg,
        sink_path=os.path.join(work, "pivoted"),
        source_format="csv",
        sink_format="parquet",
        schema="Quarter string, Product string, Brand string, Sales int, ShopID int",
    )
    out.show(truncate=False)
    back = read_source(spark, os.path.join(work, "pivoted"), "parquet")
    print(f"sink rows: {back.count()}  (at {work})")


if __name__ == "__main__":
    main()
