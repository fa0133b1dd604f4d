from tuatara_tpu.cli import main

raise SystemExit(main())
