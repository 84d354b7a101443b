-- Flagship example: the full kitchen sink — sample lerps, a subtractive
-- synth, a wavetable synth, the whole fx chain, and two band-passes.
-- Port of the reference's shipped project (/root/reference/project.lua);
-- assets are generated on first run (make_assets.py).

set_length(40.0);
set_render_samplerate(48000);
set_render_bitdepth(16);
set_output_file("outp.wav");

load_sample("snare", "../assets/snare.wav", "");
load_sample("kick", "../assets/kick.wav", "");
load_sample("hihat", "../assets/hihat_closed.wav", "");
load_sample("ride", "../assets/ride.wav", "");

load_midi_floww("bassd", "../assets/bassd.mid");
load_midi_floww("snare", "../assets/snare.mid");
load_midi_floww("comping", "../assets/comping.mid");
load_midi_floww("bass", "../assets/bass.mid");
load_midi_floww("hihat", "../assets/hihat.mid");
load_midi_floww("ride", "../assets/ride.mid");

load_lv2("reverb", "http://calf.sourceforge.net/plugins/Reverb");
load_lv2("chorus", "http://calf.sourceforge.net/plugins/MultiChorus");
load_lv2("compressor", "http://calf.sourceforge.net/plugins/Compressor");
load_lv2("tape", "http://calf.sourceforge.net/plugins/TapeSimulator");

parameter("compressor", "Attack", 40.0);
parameter("compressor", "Release", 100.0);
parameter("compressor", "Knee", 4.0);
parameter("compressor", "Ratio", 2.0);

load_resource("testtable", "../assets/testtable.wt");

add_sample_lerp("kick", 5.0, 0.0, "kick", "bassd", -1, 40);
add_sample_lerp("snare", 0.9, 0.0, "snare", "snare", -1, 40);
add_sample_lerp("hihat", 0.3, 50.0, "hihat", "hihat", -1, 40);
add_sample_lerp("ride", 0.3, -50.0, "ride", "ride", -1, 40);

hit_adsr = { 0.001, 0.02, 0.0, 0.0, 0.0, 0.0 };
note_adsr = { 0.01, 0.1, 0.8, 5.0, 0.2, 0.5 };
std_adsr = { 0.01, 1.0, 1.0, 1.0, 1.0, 0.4 };
add_synth("bass", 0.35, 0.0, "bass",
    0.4, 0.3, hit_adsr,     -- square: volume, z, envelope
    1.0, 0.8, note_adsr,    -- topflat: volume, z, envelope
    0.0, {});               -- triangle: off
add_sampsyn("comp", 0.2, 0.0, "comping", std_adsr, "testtable");

add_lv2fx("chorus", 1.0, 0.0, 1.0, "chorus");
add_lv2fx("reverb", 1.0, 0.0, 0.9, "reverb");
add_lv2fx("compress", 1.0, 0.0, 1.0, "compressor");
add_lv2fx("tape", 1.0, 0.0, 1.0, "tape");
add_bandpass("band", 1.0, 0.0, 1.0, 1000, 0, true);
add_bandpass("kickband", 1.0, 0.0, 1.0, 0, 50, true);

add_normalize("sum", 1.0, 0.0);

connect("kick", "kickband");
connect("snare", "compress");
connect("hihat", "reverb");
connect("ride", "reverb");
connect("bass", "reverb");
connect("comp", "chorus");

connect("kickband", "compress");
connect("chorus", "reverb");
connect("reverb", "compress");
connect("compress", "tape");
connect("tape", "band");
connect("band", "sum");

set_output("sum");
