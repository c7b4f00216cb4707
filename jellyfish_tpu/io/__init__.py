"""File formats and host I/O: JSON headers, binary/text DBs, FASTA/FASTQ."""
