#!/usr/bin/env ruby
# Dump every (mer, count) record of a database through the pure-Ruby
# binding (the role of the reference's examples/swig/dump.rb).
#
#   ruby -r <repo>/ruby/jellyfish_tpu examples/bindings/dump.rb counts.jf
require_relative '../../ruby/jellyfish_tpu'

abort "usage: #{$PROGRAM_NAME} db.jf" unless ARGV.length == 1
r = JellyfishTPU::ReadMerFile.new(ARGV[0])
puts "#{r.mer} #{r.count}" while r.next_mer
r.close
