from icenetetl_spark.cli import main

raise SystemExit(main())
