from cloud_dedup_ray.cli import main

raise SystemExit(main())
