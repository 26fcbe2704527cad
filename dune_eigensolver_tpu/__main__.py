from dune_eigensolver_tpu.cli import main

raise SystemExit(main())
