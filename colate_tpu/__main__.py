from colate_tpu.cli import main

raise SystemExit(main())
