from mitsuba_tpu.cli import main

raise SystemExit(main())
