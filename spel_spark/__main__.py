from spel_spark.cli import main

raise SystemExit(main())
