#!/usr/bin/env ruby
# Query mers from the command line against a database through the
# pure-Ruby binding (the role of the reference's examples/swig/query.rb).
#
#   ruby examples/bindings/query.rb counts.jf MER [MER...]
require_relative '../../ruby/jellyfish_tpu'

abort "usage: #{$PROGRAM_NAME} db.jf mer [mer...]" unless ARGV.length >= 2
q = JellyfishTPU::QueryMerFile.new(ARGV.shift)
ARGV.each { |m| puts "#{m} #{q.get(m)}" }
q.close
