from instruct_tpu.cli import main

raise SystemExit(main())
