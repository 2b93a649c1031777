from baker_spark.cli import main

raise SystemExit(main())
