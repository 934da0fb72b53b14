from deepseek_tpu.cli import main

main()
