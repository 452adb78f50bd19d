from clpspark.cli import main

raise SystemExit(main())
