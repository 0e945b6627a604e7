from tsne_flink_spark.cli import main

main()
